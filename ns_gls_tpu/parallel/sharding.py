"""Multi-chip domain decomposition: cells sharded over a device mesh.

The TPU-native replacement of the reference's p4est/MPI domain
decomposition (SURVEY §2 parallelism table; ``main.cc:230-235``):

- cells are ordered along a Morton space-filling curve (p4est's partition,
  ``Mesh.sfc_order``), padded to a multiple of the device count, and the
  *cell batch axis* is sharded over a 1-D ``jax.sharding.Mesh``,
- the global node vector is replicated; each device scatter-adds its local
  cell contributions and a ``psum`` over the mesh axis combines them — the
  ghost-exchange/compress pattern collapses into one XLA collective on ICI,
- dot products / norms in the Krylov loop operate on the replicated vector
  (no collective needed; XLA keeps them local).

This is the "replicated-DoF" parallel strategy (correct, bandwidth-simple);
a halo-exchange (``ppermute``) node-sharded variant is the planned
round-2 upgrade for very large meshes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ns_gls_tpu.fem import constraints as cstr
from ns_gls_tpu.ops.navier_stokes import CellBatch, NavierStokesOperator, NSState

AXIS = "cells"


class ShardedFaceBlock(NamedTuple):
    """FaceBlock view for the sharded path: the cell indirection is
    pre-resolved into per-face node indices (``nodes``) so faces can be
    sharded independently of cells — ``u`` is replicated, contributions
    are combined by the same psum as the cell sweep. Carries the FaceBlock
    geometry fields so ``NavierStokesOperator.face_block_terms`` accepts it
    (weak-outflow terms, ``operator_ns.cc:1195-1301``)."""

    S: jnp.ndarray          # (n_fq, n_loc)            replicated
    D: jnp.ndarray          # (n_fq, n_loc, dim)       replicated
    nodes: jnp.ndarray      # (n_bf, n_loc) int32      face-sharded
    jxw: jnp.ndarray        # (n_bf, n_fq)             face-sharded (0 on pad)
    normals: jnp.ndarray    # (n_bf, n_fq, dim)
    jinv: jnp.ndarray       # (n_bf, n_fq, dim, dim)
    beta_eff: jnp.ndarray   # (n_bf,)
    is_cut: jnp.ndarray     # (n_bf,) bool (False on pad)
    is_nitsche: jnp.ndarray  # (n_bf,) bool (False on pad)


def make_device_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (AXIS,))


def _pad_cells(arr: np.ndarray | jnp.ndarray, n_pad: int, fill=0):
    if n_pad == 0:
        return jnp.asarray(arr)
    pad_width = [(0, n_pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(jnp.asarray(arr), pad_width, constant_values=fill)


class ShardedOperator:
    """Wraps a NavierStokesOperator with a cell-sharded apply.

    The batch (geometry + gather maps) and the linearization state are
    sharded on the leading cell axis; ``vmult``/``residual`` run under
    ``shard_map`` with a final ``psum``.
    """

    def __init__(self, op: NavierStokesOperator, mesh: Mesh):
        self.op = op
        self.mesh = mesh
        n_dev = mesh.devices.size
        n_c = op.space.mesh.n_cells
        self.n_pad = (-n_c) % n_dev

        b = op.batch
        # per-shard contributions are combined by psum, so the transpose
        # gather map is disabled (empty) and the local scatter is used
        no_gather = ()
        batch = CellBatch(
            S=b.S,
            D=b.D,
            jinv=_pad_cells(b.jinv, self.n_pad),
            jxw=_pad_cells(b.jxw, self.n_pad),
            cell_nodes=_pad_cells(b.cell_nodes, self.n_pad),
            h_min_vertex=_pad_cells(b.h_min_vertex, self.n_pad, fill=1),
            h_q=_pad_cells(b.h_q, self.n_pad, fill=1),
            node_gather=no_gather,
        )
        shard = NamedSharding(mesh, P(AXIS))
        repl = NamedSharding(mesh, P())
        self.batch = CellBatch(
            S=jax.device_put(batch.S, repl),
            D=jax.device_put(batch.D, repl),
            jinv=jax.device_put(batch.jinv, shard),
            jxw=jax.device_put(batch.jxw, shard),
            cell_nodes=jax.device_put(batch.cell_nodes, shard),
            h_min_vertex=jax.device_put(batch.h_min_vertex, shard),
            h_q=jax.device_put(batch.h_q, shard),
            node_gather=(),
        )
        self._shard = shard
        self._repl = repl

        # weak-outflow face blocks: resolve the cell indirection to node
        # indices, pad each block to a device multiple, shard the face axis
        # (pad faces contribute exactly zero: jxw = 0 and both masks False)
        self.face_blocks: tuple[ShardedFaceBlock, ...] = ()
        self._face_pads: tuple[int, ...] = ()
        if op.needs_face_integrals:
            sblocks, pads = [], []
            cell_nodes_np = np.asarray(op.batch.cell_nodes)
            for fb in op.face_blocks:
                n_bf = int(fb.cells.shape[0])
                n_pad = (-n_bf) % n_dev
                pads.append(n_pad)

                def padf(x, fill=0):
                    return _pad_cells(x, n_pad, fill=fill)

                nodes = jnp.asarray(cell_nodes_np[np.asarray(fb.cells)])
                sblocks.append(
                    ShardedFaceBlock(
                        S=jax.device_put(fb.S, repl),
                        D=jax.device_put(fb.D, repl),
                        nodes=jax.device_put(padf(nodes), shard),
                        jxw=jax.device_put(padf(fb.jxw), shard),
                        normals=jax.device_put(padf(fb.normals), shard),
                        jinv=jax.device_put(padf(fb.jinv), shard),
                        beta_eff=jax.device_put(padf(fb.beta_eff), shard),
                        is_cut=jax.device_put(
                            padf(fb.is_cut, fill=False), shard
                        ),
                        is_nitsche=jax.device_put(
                            padf(fb.is_nitsche, fill=False), shard
                        ),
                    )
                )
            self.face_blocks = tuple(sblocks)
            self._face_pads = tuple(pads)
        self._build()

    def shard_state(self, state: NSState) -> NSState:
        """Pad + shard the per-cell linearization tables (and the per-face
        Nitsche/cut tables, sharded on the face axis)."""
        def f(x):
            return jax.device_put(_pad_cells(x, self.n_pad), self._shard)

        def ff(tup):
            return tuple(
                jax.device_put(_pad_cells(x, n_pad), self._shard)
                for x, n_pad in zip(tup, self._face_pads)
            )

        return state._replace(
            u_star=f(state.u_star),
            grad_u_star=f(state.grad_u_star),
            grad_p_star=f(state.grad_p_star),
            dt_u_old=f(state.dt_u_old),
            u_old_grad=f(state.u_old_grad),
            p_old_grad=f(state.p_old_grad),
            delta1=f(state.delta1),
            delta2=f(state.delta2),
            face_velocity=ff(state.face_velocity),
            face_target=ff(state.face_target),
            weight=jax.device_put(state.weight, self._repl),
            stau=jax.device_put(state.stau, self._repl),
            u_lin=jax.device_put(state.u_lin, self._repl),
            vec_old=jax.device_put(state.vec_old, self._repl),
            u_old=jax.device_put(state.u_old, self._repl),
            u_linT=jax.device_put(state.u_linT, self._repl),
            vec_oldT=jax.device_put(state.vec_oldT, self._repl),
        )

    def _build(self):
        op = self.op
        mesh = self.mesh
        ch = op.constraints_homogeneous
        n_nodes, n_comp = op.n_nodes, op.n_comp
        from ns_gls_tpu.ops.navier_stokes import fe_evaluate, fe_integrate

        def local_sweep(batch, faces, state, u_eff, residual_form):
            if op.fuse_tables:
                cq = op._fused_cq(batch, state)
            else:
                cq = dict(
                    weight=state.weight, u_star=state.u_star,
                    grad_u_star=state.grad_u_star,
                    grad_p_star=state.grad_p_star,
                    dt_u_old=state.dt_u_old, u_old_grad=state.u_old_grad,
                    p_old_grad=state.p_old_grad,
                    delta1=state.delta1, delta2=state.delta2,
                )
            u_loc = u_eff[batch.cell_nodes]
            val, grad = fe_evaluate(batch.S, batch.D, batch.jinv, u_loc)
            if residual_form or not op.increment_form:
                val_res, grad_res = op.qpoint_fixed_point(
                    val, grad, cq, residual=residual_form
                )
            else:
                val_res, grad_res = op.qpoint_increment(val, grad, cq)
            r_loc = fe_integrate(
                batch.S, batch.D, batch.jinv, batch.jxw, val_res, grad_res
            )
            r = jnp.zeros((n_nodes, n_comp), op.dtype)
            r = r.at[batch.cell_nodes].add(r_loc)
            # weak-outflow face integrals (each device owns a face slice;
            # combined by the same psum as the cell contributions)
            for k, fb in enumerate(faces):
                fr_loc = op.face_block_terms(
                    fb, u_eff[fb.nodes], state.face_velocity[k],
                    state.face_target[k], residual_form,
                )
                r = r.at[fb.nodes].add(fr_loc)
            return jax.lax.psum(r, AXIS)

        batch_specs = CellBatch(
            S=P(), D=P(), jinv=P(AXIS), jxw=P(AXIS), cell_nodes=P(AXIS),
            h_min_vertex=P(AXIS), h_q=P(AXIS), node_gather=(),
        )
        face_specs = tuple(
            ShardedFaceBlock(
                S=P(), D=P(), nodes=P(AXIS), jxw=P(AXIS), normals=P(AXIS),
                jinv=P(AXIS), beta_eff=P(AXIS), is_cut=P(AXIS),
                is_nitsche=P(AXIS),
            )
            for _ in self.face_blocks
        )

        def state_specs(state):
            return state._replace(
                u_star=P(AXIS), grad_u_star=P(AXIS), grad_p_star=P(AXIS),
                dt_u_old=P(AXIS), u_old_grad=P(AXIS), p_old_grad=P(AXIS),
                delta1=P(AXIS), delta2=P(AXIS), weight=P(), stau=P(),
                face_velocity=tuple(P(AXIS) for _ in state.face_velocity),
                face_target=tuple(P(AXIS) for _ in state.face_target),
                u_lin=P(), vec_old=P(), u_old=P(),
                u_linT=P(), vec_oldT=P(),
            )

        sspecs = state_specs(op.state)

        def make(residual_form):
            return jax.shard_map(
                lambda batch, faces, state, u: local_sweep(
                    batch, faces, state, u, residual_form
                ),
                mesh=mesh,
                in_specs=(batch_specs, face_specs, sspecs, P()),
                out_specs=P(),
            )

        sweep_lin = make(False)
        sweep_res = make(True)

        def vmult_fn(args, u):
            batch, faces, state = args
            u_eff = cstr.distribute(ch, u, homogeneous=True)
            r = sweep_lin(batch, faces, state, u_eff)
            r = cstr.condense_transpose(ch, r)
            return cstr.copy_constrained(ch, r, u)

        def residual_fn(args, ca_inhom, u):
            # exact-f32 Newton rhs, matching the unsharded residual_fn
            # (ops/navier_stokes.py:661-689) — default bf16x3 einsums
            # leave an additive residual floor that stalls Newton
            with jax.default_matmul_precision("highest"):
                batch, faces, state = args
                tmp = cstr.distribute(ca_inhom, u, homogeneous=False)
                r = sweep_res(batch, faces, state, tmp)
                # Cᵀ on the write side (matches NavierStokesOperator
                # .residual): master rows must receive hanging-slave
                # contributions.
                return -cstr.condense_transpose(ch, r)

        self.vmult_pure = vmult_fn
        self._vmult = jax.jit(vmult_fn)
        self._residual = jax.jit(residual_fn)

    # ------------------------------------------------------------------
    @property
    def vmult_args(self):
        return (
            self.batch, self.face_blocks, self.shard_state(self.op.state)
        )

    def vmult(self, u):
        return self._vmult(self.vmult_args, u)

    def evaluate_residual(self, u):
        return self._residual(
            self.vmult_args, self.op.constraints_inhomogeneous, u
        )

    def evaluate_rhs(self):
        import jax.numpy as jnp

        zero = jnp.zeros((self.n_nodes, self.n_comp), self.dtype)
        return self._residual(
            self.vmult_args, self.op.constraints_inhomogeneous, zero
        )

    # -- OperatorBase surface delegated to the wrapped operator ----------
    def set_linearization_point(self, u):
        self.op.set_linearization_point(u)

    def set_previous_solution(self, history):
        self.op.set_previous_solution(history)

    def invalidate_system(self):
        self.op.invalidate_system()

    def update_weight(self):
        self.op.update_weight()

    def get_max_u(self, u):
        return self.op.get_max_u(u)

    @property
    def constraints_homogeneous(self):
        return self.op.constraints_homogeneous

    @property
    def constraints_inhomogeneous(self):
        return self.op.constraints_inhomogeneous

    @constraints_inhomogeneous.setter
    def constraints_inhomogeneous(self, value):
        self.op.constraints_inhomogeneous = value

    @property
    def space(self):
        return self.op.space

    @property
    def dtype(self):
        return self.op.dtype

    @property
    def n_comp(self):
        return self.op.n_comp

    @property
    def n_nodes(self):
        return self.op.n_nodes
