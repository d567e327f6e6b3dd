"""General-mesh node-sharded operator: SFC partition + ppermute halo.

The scalable multi-chip path for UNSTRUCTURED meshes — the TPU-native
re-design of the reference's partitioned DoF vectors with ghost
update/compress (``operator_ns.cc:260,346,634-639``; ``main.cc:265-266``;
p4est SFC partition ``main.cc:230-233``):

- cells are ordered along a Morton curve and chunked contiguously across
  a 1-D device mesh (the p4est partition); each node is OWNED by the
  lowest-rank device whose cells touch it,
- each device works on a LOCAL window ``[owned | ghosts | trash]``: its
  owned nodes, the ghost nodes its cells (and constraint masters) need,
  plus one trash slot absorbing padded index traffic,
- the apply is one ``shard_map``: fill owned -> ghost-exchange
  (``lax.ppermute``, one round per SFC-neighbor distance, payload =
  O(ghost) — the ``update_ghost_values`` analogue) -> per-device
  constraint distribute -> local gather/evaluate/physics/integrate/
  scatter sweep -> per-device constraint condense -> reverse exchange
  scatter-add (the ``compress(add)`` analogue) -> owned slice.
  Per-apply collective volume is O(halo), independent of N,
- distributed vectors have layout (n_dev, n_own_max, C), sharded on axis
  0 with zero padding, so Krylov dot products reduce with one psum and
  need no ownership masks,
- constraints (Dirichlet / hanging / slip / periodic) are localized per
  device: every device that sees a constrained node resolves it from its
  local master copies (consistent by construction), and the write-side
  Cᵀ moves each device's own partial onto local masters before the
  compress sums them at the owners.

The GMG V-cycle runs fully distributed as well: level operators are
halo-sharded, MG transfers are :class:`HaloTransferOps` (window gather +
ppermute, O(inter-device interface) payloads), and only the (small)
coarse solve gathers to the replicated layout — so the Krylov loop never
touches an O(N) collective.  ``StructuredShardedOperator`` stays the
specialised fast path for structured lattices.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ns_gls_tpu.fem.constraints import ConstraintArrays
from ns_gls_tpu.ops.navier_stokes import (
    CellBatch,
    NavierStokesOperator,
    fe_evaluate,
    fe_integrate,
)

AXIS = "cells"


class HaloFaceBlock(NamedTuple):
    """Face batch in local-slot numbering, device-major (axis 0)."""

    S: jnp.ndarray          # (n_fq, n_loc)           replicated
    D: jnp.ndarray          # (n_fq, n_loc, dim)      replicated
    nodes: jnp.ndarray      # (n_dev, n_bf, n_loc)    local slots
    jxw: jnp.ndarray        # (n_dev, n_bf, n_fq)     0 on pads
    normals: jnp.ndarray
    jinv: jnp.ndarray
    beta_eff: jnp.ndarray
    is_cut: jnp.ndarray
    is_nitsche: jnp.ndarray
    src: jnp.ndarray        # (n_dev, n_bf) int32 global face index (host)


class HaloArgs(NamedTuple):
    """Dynamic pytree for the jitted halo apply (all device-major)."""

    batch: CellBatch        # chunked per device (leading axis n_dev)
    faces: tuple            # HaloFaceBlock per block
    state: tuple            # localized NSState-like dict (see _local_state)
    cstr_h: ConstraintArrays    # homogeneous, local slots (all rows seen)
    cstr_own: ConstraintArrays  # homogeneous rows owned by the device
    cstr_i: ConstraintArrays    # inhomogeneous, local slots
    prism: tuple = ()       # (HaloPrismArgs,) when the distributed prism
    #                         fast path is active (parallel/halo_prism.py)
    patch2: tuple = ()      # (HaloPatch2DArgs,) when the distributed
    #                         patch-2D fast path is active
    patch3: tuple = ()      # (HaloPatch3DArgs,) likewise for general 3D


def _pad_rows(a: np.ndarray, n: int, fill=0):
    if a.shape[0] == n:
        return a
    pad = np.full((n - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad], axis=0)


class HaloShardedOperator:
    """Node-sharded wrapper around a general :class:`NavierStokesOperator`.

    ``vmult_pure(args, u)`` / ``residual_pure`` operate on distributed
    (n_dev, n_own_max, C) vectors; ``to_dist`` / ``to_global`` convert at
    solver boundaries.  The plain ``vmult``/``evaluate_residual`` accept
    and return GLOBAL vectors (drop-in for ``ShardedOperator``).
    """

    def __init__(self, op: NavierStokesOperator, mesh: Mesh):
        self.op = op
        self.mesh = mesh
        self.n_dev = n_dev = int(mesh.devices.size)
        space = op.space
        C = op.n_comp
        n_c = space.mesh.n_cells
        n_nodes = op.n_nodes
        cell_nodes = np.asarray(space.cell_nodes)

        # ---- SFC partition (p4est analogue) ---------------------------
        # Extruded meshes with a prism fast path partition by 2D patch
        # (whole z-columns per device) so the Pallas prism sweep can run
        # as the local sweep (parallel/halo_prism.py); everything else
        # partitions by Morton-ordered cell chunks.
        import os

        patches_of = None
        if (getattr(op, "_psweep", None) is not None
                and os.environ.get("NS_HALO_PRISM", "1") != "0"):
            from ns_gls_tpu.parallel.halo_prism import prism_patch_partition

            part = prism_patch_partition(space, n_dev)
            if part is not None:
                cells_of, patches_of = part
                chunk = max(len(cd) for cd in cells_of)
        if (patches_of is None
                and getattr(op, "_p2sweep", None) is not None
                and os.environ.get("NS_HALO_PATCH2D", "1") != "0"):
            from ns_gls_tpu.parallel.halo_patch2d import patch2d_partition

            part = patch2d_partition(space, n_dev)
            if part is not None:
                cells_of, patches_of = part
                chunk = max(len(cd) for cd in cells_of)
        if (patches_of is None
                and getattr(op, "_p3sweep", None) is not None
                and os.environ.get("NS_HALO_PATCH3D", "1") != "0"):
            from ns_gls_tpu.parallel.halo_patch3d import patch3d_partition

            part = patch3d_partition(space, n_dev)
            if part is not None:
                cells_of, patches_of = part
                chunk = max(len(cd) for cd in cells_of)
        if patches_of is None:
            perm = space.mesh.sfc_order()
            chunk = -(-n_c // n_dev)
            cells_of = [
                perm[d * chunk: min((d + 1) * chunk, n_c)]
                for d in range(n_dev)
            ]
        self.chunk = chunk

        # ---- ownership + local windows --------------------------------
        touched = [np.unique(cell_nodes[cd]) for cd in cells_of]
        owner = np.full(n_nodes, n_dev, np.int64)
        for d in range(n_dev - 1, -1, -1):
            owner[touched[d]] = d
        assert owner.max() < n_dev, "orphan nodes"

        # constraint masters must be resolvable locally: extend each
        # window with the master nodes of every constraint whose row node
        # the device sees (hanging/slip/periodic; chains are resolved at
        # close(), so one extension round suffices)
        ch = op.constraints_homogeneous
        ci = op.constraints_inhomogeneous
        assert ci is not None, "set constraints_inhomogeneous before sharding"
        masters_of = {}
        for ca in (ch, ci):
            rows = np.asarray(ca.rows)
            if rows.size == 0:
                continue
            rnode = rows // C
            cnode = np.asarray(ca.cols) // C
            w = np.asarray(ca.weights)
            for i in range(len(rows)):
                deps = np.unique(cnode[i][w[i] != 0.0])
                if deps.size:
                    prev = masters_of.get(int(rnode[i]))
                    masters_of[int(rnode[i])] = (
                        deps if prev is None else np.union1d(prev, deps)
                    )

        local = []
        for d in range(n_dev):
            ext = [touched[d]]
            for n in touched[d]:
                m = masters_of.get(int(n))
                if m is not None:
                    ext.append(m)
            local.append(np.unique(np.concatenate(ext)))

        own = [ld[owner[ld] == d] for d, ld in enumerate(local)]
        ghost = [ld[owner[ld] != d] for d, ld in enumerate(local)]
        # kept for layout-coupled consumers (MG transfers): node ownership
        # and per-device owned-node lists in slot order
        self.owner = owner
        self.own_lists = own
        self.n_own_max = n_own_max = max(len(o) for o in own)
        n_gh_max = max((len(g) for g in ghost), default=0)
        # local slot layout: [owned | ghosts | trash]
        self.n_loc = n_loc = n_own_max + n_gh_max
        self.trash = n_loc

        g2l = np.full((n_dev, n_nodes), n_loc, np.int64)
        own_global = np.zeros((n_dev, n_own_max), np.int64)
        own_mask = np.zeros((n_dev, n_own_max), bool)
        loc_global = np.zeros((n_dev, n_loc + 1), np.int64)
        for d in range(n_dev):
            g2l[d, own[d]] = np.arange(len(own[d]))
            g2l[d, ghost[d]] = n_own_max + np.arange(len(ghost[d]))
            own_global[d, : len(own[d])] = own[d]
            own_mask[d, : len(own[d])] = True
            loc_global[d, : len(own[d])] = own[d]
            loc_global[d, n_own_max: n_own_max + len(ghost[d])] = ghost[d]
        self._own_global = jnp.asarray(own_global)
        self._own_mask = jnp.asarray(own_mask)
        self._loc_global = jnp.asarray(loc_global)

        # ---- ghost-exchange plan (one ppermute round per distance) ----
        # ghost g on device d comes from owner o = owner[g]; round key
        # delta = d - o. For each delta, device o sends the values of its
        # owned slots send_idx[o] and device o+delta writes them at its
        # ghost slots recv_idx[o+delta].
        plans = {}
        for d in range(n_dev):
            if not len(ghost[d]):
                continue
            og = owner[ghost[d]]
            for o in np.unique(og):
                delta = int(d - o)
                nodes = ghost[d][og == o]
                plans.setdefault(delta, {})[int(o)] = nodes
        self._rounds = []
        for delta in sorted(plans):
            by_src = plans[delta]
            L = max(len(v) for v in by_src.values())
            send = np.full((n_dev, L), 0, np.int64)        # owned slots
            recv = np.full((n_dev, L), n_loc, np.int64)    # ghost slots
            pairs = []
            for o, nodes in sorted(by_src.items()):
                send[o] = _pad_rows(g2l[o, nodes], L, 0)
                recv[o + delta] = _pad_rows(g2l[o + delta, nodes], L, n_loc)
                pairs.append((o, o + delta))
            self._rounds.append(
                (tuple(pairs), jnp.asarray(send), jnp.asarray(recv))
            )
        self.halo_bytes = int(
            sum(s.shape[1] * len(p) for p, s, _ in self._rounds)
        ) * C * np.dtype(np.float32).itemsize

        # ---- chunked cell batch in local numbering --------------------
        b = op.batch

        def chunk_cells(x, fill=0.0):
            x = np.asarray(x)
            out = np.full((n_dev, chunk) + x.shape[1:], fill, x.dtype)
            for d, cd in enumerate(cells_of):
                out[d, : len(cd)] = x[cd]
            return jnp.asarray(out)

        cn_loc = np.zeros((n_dev, chunk, cell_nodes.shape[1]), np.int64)
        for d, cd in enumerate(cells_of):
            cn_loc[d, : len(cd)] = g2l[d, cell_nodes[cd]]
        self.batch = CellBatch(
            S=b.S,
            D=b.D,
            jinv=chunk_cells(b.jinv),
            jxw=chunk_cells(b.jxw),          # pad cells: jxw = 0
            cell_nodes=jnp.asarray(cn_loc.astype(np.int32)),
            h_min_vertex=chunk_cells(b.h_min_vertex, fill=1.0),
            h_q=chunk_cells(b.h_q, fill=1.0),
            node_gather=(),
        )
        self._cells_of = cells_of
        # padded partition gather map: per-cell state tables are chunked
        # device-major with ONE gather (pad rows point at a trailing zero
        # cell) instead of per-device at[].set loops — keeps the sharded
        # path on the single-device dispatch-fusion standard
        cells_pad = np.full((n_dev, chunk), n_c, np.int64)
        for d, cd in enumerate(cells_of):
            cells_pad[d, : len(cd)] = cd
        self._cells_pad = jnp.asarray(cells_pad.astype(np.int32))
        self._localize_state = None
        self._args_cache = None

        # ---- distributed prism fast path -------------------------------
        # per-device prism tables: the local window of each device IS a
        # (local 2D factor) x (full z) product under the patch partition
        self._halo_prism = None
        self._prism_sweep = None
        self._prism_lin_idx = None
        self._halo_patch2 = None
        self._patch2_sweep = None
        self._patch2_lin_idx = None
        self._halo_patch3 = None
        self._patch3_sweep = None
        self._patch3_lin_idx = None
        self._args_state_src = None
        if patches_of is not None and getattr(op, "_psweep", None) is not None:
            from ns_gls_tpu.parallel.halo_prism import build_halo_prism

            built = build_halo_prism(op, patches_of, g2l, n_loc)
            if built is not None:
                self._halo_prism, self._prism_sweep, self._prism_lin_idx = (
                    built
                )
        elif patches_of is not None and getattr(op, "_p2sweep", None) \
                is not None:
            from ns_gls_tpu.parallel.halo_patch2d import build_halo_patch2d

            built = build_halo_patch2d(op, patches_of, g2l, n_loc)
            if built is not None:
                self._halo_patch2, self._patch2_sweep, \
                    self._patch2_lin_idx = built
        elif patches_of is not None:
            from ns_gls_tpu.parallel.halo_patch3d import build_halo_patch3d

            built = build_halo_patch3d(op, patches_of, g2l, n_loc)
            if built is not None:
                self._halo_patch3, self._patch3_sweep, \
                    self._patch3_lin_idx = built

        # ---- constraints localized to the windows ---------------------
        self._g2l = g2l
        self._cstr_h = self._localize_cstr(ch, owned_only=False)
        self._cstr_own = self._localize_cstr(ch, owned_only=True, owner=owner)
        self._ci_struct = None   # static structure of the inhom set
        self._set_cstr_inhom(ci)

        # ---- faces ----------------------------------------------------
        self.face_blocks: tuple[HaloFaceBlock, ...] = ()
        if op.needs_face_integrals:
            cell_dev = np.empty(n_c, np.int64)
            for d, cd in enumerate(cells_of):
                cell_dev[cd] = d
            blocks = []
            for fb in op.face_blocks:
                fc = np.asarray(fb.cells)
                fd = cell_dev[fc]
                n_bf = max(np.bincount(fd, minlength=n_dev).max(), 1)

                def fpack(x, fill=0.0):
                    x = np.asarray(x)
                    out = np.full((n_dev, n_bf) + x.shape[1:], fill, x.dtype)
                    for d in range(n_dev):
                        sel = np.nonzero(fd == d)[0]
                        out[d, : len(sel)] = x[sel]
                    return jnp.asarray(out)

                nodes = np.full(
                    (n_dev, n_bf, cell_nodes.shape[1]), n_loc, np.int64
                )
                src = np.zeros((n_dev, n_bf), np.int64)
                for d in range(n_dev):
                    sel = np.nonzero(fd == d)[0]
                    nodes[d, : len(sel)] = g2l[d, cell_nodes[fc[sel]]]
                    src[d, : len(sel)] = sel
                blocks.append(
                    HaloFaceBlock(
                        S=fb.S, D=fb.D,
                        nodes=jnp.asarray(nodes.astype(np.int32)),
                        jxw=fpack(fb.jxw),
                        normals=fpack(fb.normals),
                        jinv=fpack(fb.jinv),
                        beta_eff=fpack(fb.beta_eff),
                        is_cut=fpack(fb.is_cut, fill=False),
                        is_nitsche=fpack(fb.is_nitsche, fill=False),
                        src=jnp.asarray(src),
                    )
                )
            self.face_blocks = tuple(blocks)

        self._shard = NamedSharding(mesh, P(AXIS))
        self._repl = NamedSharding(mesh, P())
        self._build()

    # ------------------------------------------------------------------
    def _localize_cstr(self, ca: ConstraintArrays, owned_only: bool,
                       owner=None) -> ConstraintArrays:
        """Constraint arrays in local slot numbering, device-major.
        Returns (n_dev, L[, ...]) arrays; also records the global->slot
        selection for fast per-step inhomogeneity refresh."""
        C = self.op.n_comp
        n_dev, n_loc = self.n_dev, self.n_loc
        rows = np.asarray(ca.rows)
        cols = np.asarray(ca.cols)
        w = np.asarray(ca.weights)
        inh = np.asarray(ca.inhom)
        rnode, rcomp = rows // C, rows % C
        sels, rloc, cloc = [], [], []
        for d in range(n_dev):
            here = self._g2l[d, rnode] < n_loc
            if owned_only:
                here &= owner[rnode] == d
            sel = np.nonzero(here)[0]
            sels.append(sel)
            rloc.append(self._g2l[d, rnode[sel]] * C + rcomp[sel])
            cl = self._g2l[d, cols[sel] // C] * C + cols[sel] % C
            # deps with zero weight may lie outside the window: point at 0
            cl = np.where(w[sel] != 0.0, cl, 0)
            assert (cl < n_loc * C + C).all()
            cloc.append(cl)
        L = max((len(s) for s in sels), default=0)
        L = max(L, 1)
        md = cols.shape[1] if cols.ndim == 2 else 1
        trash_dof = n_loc * C
        out_r = np.full((n_dev, L), trash_dof, np.int64)
        out_c = np.zeros((n_dev, L, md), np.int64)
        out_w = np.zeros((n_dev, L, md), w.dtype if w.size else np.float32)
        out_i = np.zeros((n_dev, L), inh.dtype if inh.size else np.float32)
        for d in range(n_dev):
            n = len(sels[d])
            out_r[d, :n] = rloc[d]
            out_c[d, :n] = cloc[d]
            out_w[d, :n] = w[sels[d]]
            out_i[d, :n] = inh[sels[d]]
        res = ConstraintArrays(
            rows=jnp.asarray(out_r.astype(np.int32)),
            cols=jnp.asarray(out_c.astype(np.int32)),
            weights=jnp.asarray(out_w),
            inhom=jnp.asarray(out_i),
        )
        res_sel = (sels, L)
        if not owned_only:
            self._last_sel = res_sel
        return res

    def _set_cstr_inhom(self, ci: ConstraintArrays):
        """(Re)localize the inhomogeneous set.  Structure (rows/cols/
        weights) is time-independent; only the values change per step."""
        self._args_cache = None
        if self._ci_struct is None:
            self._ci_struct = self._localize_cstr(ci, owned_only=False)
            self._ci_sel = self._last_sel
            self._cstr_i = self._ci_struct
        else:
            sels, L = self._ci_sel
            inh = np.asarray(ci.inhom)
            out = np.zeros((self.n_dev, L), inh.dtype)
            for d in range(self.n_dev):
                out[d, : len(sels[d])] = inh[sels[d]]
            self._cstr_i = self._ci_struct._replace(
                inhom=jax.device_put(jnp.asarray(out), self._shard)
            )

    # ------------------------------------------------------------------
    def _local_state(self):
        """Localize op.state: per-cell tables chunked by the partition,
        node-vector tables gathered into the local windows.

        The whole localization is ONE jitted dispatch (padded partition
        gather + window gathers) — the sharded analogue of the
        single-device dispatch-fusion discipline; the old per-device
        ``at[d].set`` loops issued ~10 fields x n_dev device ops every
        rebuild."""
        if self._localize_state is None:
            cells_pad = self._cells_pad
            loc_global = self._loc_global
            face_srcs = tuple(fb.src for fb in self.face_blocks)
            prism_idx = self._prism_lin_idx
            if prism_idx is not None:
                n2d = self.op.space.n2d
                Nzn = self._prism_sweep.Nzn
                dim = self.op.space.dim

                def planes_of(x, lead):
                    """Global (n_nodes, C) -> per-device patch planes
                    (n_dev, lead, nGP, XrG, Nzn); pads read the zero row."""
                    v = x.T[:lead].reshape(lead, n2d, Nzn)
                    vz = jnp.concatenate(
                        [v, jnp.zeros((lead, 1, Nzn), v.dtype)], axis=1
                    )
                    return jnp.moveaxis(vz[:, prism_idx], 1, 0)
            patch2_idx = self._patch2_lin_idx
            if patch2_idx is not None:
                dim = self.op.space.dim

                def planes2_of(x, lead):
                    """Global (n_nodes, C) -> per-device patch planes
                    (n_dev, lead, n_groups, GXn, HYn); pads read zero."""
                    v = x.T[:lead]
                    vz = jnp.concatenate(
                        [v, jnp.zeros((lead, 1), v.dtype)], axis=1
                    )
                    return jnp.moveaxis(vz[:, patch2_idx], 1, 0)
            patch3_idx = self._patch3_lin_idx
            if patch3_idx is not None:
                dim = self.op.space.dim

                def planes3_of(x, lead):
                    """Global (n_nodes, C) -> per-device plane tensors
                    (n_dev, lead, ng*PlY, GXn, HZn); pads read zero."""
                    v = x.T[:lead]
                    vz = jnp.concatenate(
                        [v, jnp.zeros((lead, 1), v.dtype)], axis=1
                    )
                    return jnp.moveaxis(vz[:, patch3_idx], 1, 0)

            def chunk_cells(x):
                if x.shape[0] == 0:
                    return x
                xz = jnp.concatenate(
                    [x, jnp.zeros((1,) + x.shape[1:], x.dtype)], axis=0
                )
                return xz[cells_pad]

            def window(x):
                if x.shape[0] == 0:
                    return x
                return x[loc_global]         # (n_dev, n_loc+1, C)

            def face_chunk(k, x):
                if not isinstance(x, (jnp.ndarray, np.ndarray)):
                    return x
                if getattr(x, "shape", (0,))[0] == 0:
                    return x
                return x[face_srcs[k]]       # (n_dev, n_bf, ...)

            def localize(st):
                face_v = tuple(
                    face_chunk(k, x)
                    for k, x in enumerate(st.face_velocity)
                )
                face_t = tuple(
                    face_chunk(k, x) for k, x in enumerate(st.face_target)
                )
                if prism_idx is not None:
                    u_linT = planes_of(st.u_lin, st.u_lin.shape[1])
                    vec_oldT = planes_of(st.vec_old, dim)
                elif patch2_idx is not None:
                    u_linT = planes2_of(st.u_lin, st.u_lin.shape[1])
                    vec_oldT = planes2_of(st.vec_old, dim)
                elif patch3_idx is not None:
                    u_linT = planes3_of(st.u_lin, st.u_lin.shape[1])
                    vec_oldT = planes3_of(st.vec_old, dim)
                else:
                    u_linT = jnp.zeros((0,), st.u_linT.dtype)
                    vec_oldT = jnp.zeros((0,), st.vec_oldT.dtype)
                return st._replace(
                    u_star=chunk_cells(st.u_star),
                    grad_u_star=chunk_cells(st.grad_u_star),
                    grad_p_star=chunk_cells(st.grad_p_star),
                    dt_u_old=chunk_cells(st.dt_u_old),
                    u_old_grad=chunk_cells(st.u_old_grad),
                    p_old_grad=chunk_cells(st.p_old_grad),
                    delta1=chunk_cells(st.delta1),
                    delta2=chunk_cells(st.delta2),
                    face_velocity=face_v,
                    face_target=face_t,
                    u_lin=window(st.u_lin),
                    vec_old=window(st.vec_old),
                    u_old=window(st.u_old),
                    u_linT=u_linT,
                    vec_oldT=vec_oldT,
                )

            self._localize_fn = localize
            self._localize_state = jax.jit(localize)
        return self._localize_state(self.op.state)

    # ------------------------------------------------------------------
    def _build(self):
        op = self.op
        C = op.n_comp
        n_loc = self.n_loc
        n_own_max = self.n_own_max
        rounds = self._rounds

        def exchange_fill(w):
            """Owned -> ghost value transfer (update_ghost_values)."""
            me = jax.lax.axis_index(AXIS)
            for pairs, send, recv in rounds:
                snd = send[me]
                rcv = recv[me]
                buf = w[snd]
                buf = jax.lax.ppermute(buf, AXIS, perm=list(pairs))
                w = w.at[rcv].set(
                    jnp.where(rcv[:, None] < n_loc, buf, w[rcv])
                )
            return w

        def compress(r):
            """Ghost partial sums -> owners, scatter-add (compress(add))."""
            me = jax.lax.axis_index(AXIS)
            for pairs, send, recv in rounds:
                snd = send[me]
                rcv = recv[me]
                buf = r[rcv]
                back = [(b, a) for (a, b) in pairs]
                buf = jax.lax.ppermute(buf, AXIS, perm=back)
                mask = (rcv < n_loc)[:, None]
                # the sender's mask rides with the payload: a device with
                # no partner in this round received zeros
                r = r.at[snd].add(buf)
                r = r.at[rcv].set(
                    jnp.where(mask, jnp.zeros_like(buf), r[rcv])
                )
            return r

        def cdistribute(ca, u, homogeneous):
            uf = u.reshape(-1)
            vals = (uf[ca.cols] * ca.weights).sum(axis=1)
            if not homogeneous:
                vals = vals + ca.inhom
            return uf.at[ca.rows].set(vals).reshape(u.shape)

        def ccondense_t(ca, r):
            rf = r.reshape(-1)
            vals = rf[ca.rows]
            rf = rf.at[ca.cols.reshape(-1)].add(
                (ca.weights * vals[:, None]).reshape(-1)
            )
            return rf.at[ca.rows].set(0.0).reshape(r.shape)

        specs_template = self._args_specs()

        def sq(spec_tree, t):
            """Strip the leading device axis from the P(AXIS) blocks
            (shard_map delivers them with extent 1)."""
            return jax.tree_util.tree_map(
                lambda s, x: x[0] if s == P(AXIS) else x, spec_tree, t
            )

        psweep = self._prism_sweep
        p2sweep = self._patch2_sweep
        p3sweep = self._patch3_sweep

        def prism_cells(args: HaloArgs, state, w, residual_form):
            """Per-device fused prism sweep (parallel/halo_prism.py):
            whole-column window gather -> Pallas kernel -> seam-compressed
            column scatter-add.  The reverse ghost exchange after this
            sums the inter-device seam partials, exactly as for the
            general sweep."""
            pa = sq(specs_template.prism[0], args.prism[0])
            Nzn = psweep.Nzn
            zr = jnp.arange(Nzn, dtype=jnp.int32)
            # window + Nzn zero rows: padded gather columns land there
            wg = jnp.concatenate(
                [w[:n_loc], jnp.zeros((Nzn, C), w.dtype)], axis=0
            )
            gslot = pa.tables.gather_nodes.reshape(-1, psweep.XrG)
            uP = wg[gslot[:, :, None] + zr[None, None, :]]
            uP = jnp.moveaxis(uP, -1, 0)         # (C, nGP, XrG, Nzn)
            flavor = (
                "residual" if residual_form
                else ("increment" if op.increment_form else "fixed")
            )
            r2d = psweep.apply(
                pa.tables, state.weight, state.stau, uP,
                state.u_linT, state.vec_oldT, flavor,
            )                                    # (C, n2d_cat, Nzn)
            rbuf = jnp.zeros((n_loc + Nzn, C), op.dtype)
            idx = pa.oslot[:, None] + zr[None, :]
            rbuf = rbuf.at[idx].add(jnp.moveaxis(r2d, 0, -1))
            return jnp.concatenate(
                [rbuf[:n_loc], jnp.zeros((1, C), op.dtype)], axis=0
            )

        def patch2_cells(args: HaloArgs, state, w, residual_form):
            """Per-device fused patch-2D sweep (parallel/halo_patch2d.py):
            window gather -> Pallas kernel -> seam-compressed scatter-add;
            the reverse ghost exchange sums inter-device seam partials."""
            pa = sq(specs_template.patch2[0], args.patch2[0])
            # window + zero row: padded gather slots land there
            wg = jnp.concatenate(
                [w[:n_loc], jnp.zeros((1, C), w.dtype)], axis=0
            )
            uP = jnp.moveaxis(wg[pa.tables.gather_nodes], -1, 0)
            #                                  (C, n_groups, GXn, HYn)
            flavor = (
                "residual" if residual_form
                else ("increment" if op.increment_form else "fixed")
            )
            r2 = p2sweep.apply(
                pa.tables, state.weight, state.stau, uP,
                state.u_linT, state.vec_oldT, flavor,
            )                                    # (C, n_cat)
            rbuf = jnp.zeros((n_loc + 1, C), op.dtype)
            rbuf = rbuf.at[pa.oslot].add(r2.T)
            return rbuf.at[n_loc].set(0.0)

        def patch3_cells(args: HaloArgs, state, w, residual_form):
            """Per-device fused patch-3D sweep (parallel/halo_patch3d.py);
            same contract as patch2_cells."""
            pa = sq(specs_template.patch3[0], args.patch3[0])
            wg = jnp.concatenate(
                [w[:n_loc], jnp.zeros((1, C), w.dtype)], axis=0
            )
            g = wg[pa.tables.gather_nodes]   # (ng, PlY, GXn, HZn, C)
            ng, PlY, GXn, HZn, _ = g.shape
            uP = jnp.moveaxis(g, -1, 0).reshape(C, ng * PlY, GXn, HZn)
            flavor = (
                "residual" if residual_form
                else ("increment" if op.increment_form else "fixed")
            )
            r3 = p3sweep.apply(
                pa.tables, state.weight, state.stau, uP,
                state.u_linT, state.vec_oldT, flavor,
            )                                    # (C, n_cat)
            rbuf = jnp.zeros((n_loc + 1, C), op.dtype)
            rbuf = rbuf.at[pa.oslot].add(r3.T)
            return rbuf.at[n_loc].set(0.0)

        def general_cells(args: HaloArgs, state, w, residual_form):
            batch = sq(specs_template.batch, args.batch)
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
            u_loc = w[batch.cell_nodes]
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
            r = jnp.zeros((n_loc + 1, C), op.dtype)
            return r.at[batch.cell_nodes].add(r_loc)

        def local_sweep(args: HaloArgs, u_own, residual_form):
            state = sq(specs_template.state, args.state)
            # [owned | ghost | trash] window, one trash slot (+1)
            w = jnp.zeros((n_loc + 1, C), op.dtype)
            w = w.at[:n_own_max].set(u_own[0])
            w = exchange_fill(w)
            ca = sq(
                specs_template.cstr_i,
                args.cstr_i if residual_form else args.cstr_h,
            )
            w = cdistribute(ca, w, homogeneous=not residual_form)

            if psweep is not None:
                r = prism_cells(args, state, w, residual_form)
            elif p2sweep is not None:
                r = patch2_cells(args, state, w, residual_form)
            elif p3sweep is not None:
                r = patch3_cells(args, state, w, residual_form)
            else:
                r = general_cells(args, state, w, residual_form)
            for k, hfb in enumerate(args.faces):
                fb = sq(specs_template.faces[k], hfb)
                fr_loc = op.face_block_terms(
                    fb, w[fb.nodes], state.face_velocity[k],
                    state.face_target[k], residual_form,
                )
                r = r.at[fb.nodes].add(fr_loc)
            r = ccondense_t(sq(specs_template.cstr_h, args.cstr_h), r)
            r = r.at[self.trash].set(0.0)
            r = compress(r)
            return r[:n_own_max][None]

        def copy_constrained_own(ca_own, dst, src):
            # dst/src: (n_dev, n_own_max, C) OUTSIDE shard_map; rows index
            # the owned region of the (n_loc+1, C) window, which aliases
            # [0, n_own_max) — valid on the owned slice directly.
            def per_dev(ca, dstd, srcd):
                df = dstd.reshape(-1)
                sf = srcd.reshape(-1)
                keep = ca.rows < n_own_max * C
                rows = jnp.where(keep, ca.rows, n_own_max * C)
                pad = jnp.zeros((C,), dstd.dtype)
                df = jnp.concatenate([df, pad])
                sf = jnp.concatenate([sf, pad])
                df = df.at[rows].set(sf[rows])
                return df[: n_own_max * C].reshape(dstd.shape)

            return jax.vmap(per_dev)(ca_own, dst, src)

        mesh = self.mesh

        def make(residual_form):
            fn = jax.shard_map(
                lambda args, u: local_sweep(args, u, residual_form),
                mesh=mesh,
                in_specs=(specs_template, P(AXIS)),
                out_specs=P(AXIS),
                check_vma=False,
            )
            return fn

        sweep_lin = make(False)
        sweep_res = make(True)

        def vmult_fn(args: HaloArgs, u):
            r = sweep_lin(args, u)
            return copy_constrained_own(args.cstr_own, r, u)

        def residual_fn(args: HaloArgs, u):
            # Newton rhs AND convergence test — must carry the same
            # exact-f32 treatment as the unsharded residual_fn
            # (ops/navier_stokes.py:661-689): TPU's default bf16x3
            # einsums leave a ~3e-3 additive floor on large-magnitude
            # states that stalls Newton; HIGHEST restores f64-matching
            # residuals at once-per-Newton-iteration cost.
            with jax.default_matmul_precision("highest"):
                r = sweep_res(args, u)
                return -r

        self.vmult_pure = vmult_fn
        self.residual_pure = residual_fn
        self._vmult = jax.jit(vmult_fn, out_shardings=self._shard)
        self._residual = jax.jit(residual_fn, out_shardings=self._shard)

        own_global, own_mask = self._own_global, self._own_mask
        n_nodes = op.n_nodes

        def to_dist_fn(u):
            return u[own_global] * own_mask[..., None].astype(u.dtype)

        def to_global_fn(ud):
            def per_dev(carry, dev):
                og, mask, u_own = dev
                return carry.at[og].add(
                    u_own * mask[:, None].astype(u_own.dtype)
                ), None

            out = jnp.zeros((n_nodes, C), ud.dtype)
            out, _ = jax.lax.scan(
                per_dev, out, (own_global, own_mask, ud)
            )
            return out

        self.to_dist = jax.jit(to_dist_fn, out_shardings=self._shard)
        self.to_global = jax.jit(to_global_fn, out_shardings=self._repl)
        self._pin_shardings()

    def _pin_shardings(self):
        """Pin every args-template leaf (and the wrapped operator's
        full-size tables) to its steady-state sharding ONCE, and make
        the jitted producers EMIT those shardings.  Without this, every
        jitted solver call re-shards each mismatched argument leaf on
        entry (``shard_device_array``/``_multi_slice``) — measured 116
        extra executable launches per steady solver cycle on the
        8-device dryrun, and real D2D copies on multi-chip hardware."""
        specs = self._args_specs()
        mesh = self.mesh

        def put(x, s):
            if hasattr(x, "ndim"):
                return jax.device_put(x, NamedSharding(mesh, s))
            return x

        # replicate the wrapped operator's full-size tables FIRST (they
        # enter the fused sharded Newton advance every iteration), so the
        # template localized below is built from the final state pytree
        put_r = (lambda x: jax.device_put(x, self._repl)
                 if hasattr(x, "ndim") else x)
        self.op.batch = jax.tree.map(put_r, self.op.batch)
        self.op.face_blocks = jax.tree.map(put_r, self.op.face_blocks)
        self.op.state = jax.tree.map(put_r, self.op.state)

        placed = jax.tree.map(put, self._args_template(), specs)
        self.batch = placed.batch
        self.face_blocks = placed.faces
        self._cstr_h = placed.cstr_h
        self._cstr_own = placed.cstr_own
        self._cstr_i = placed.cstr_i
        if placed.prism:
            self._halo_prism = placed.prism[0]
        if placed.patch2:
            self._halo_patch2 = placed.patch2[0]
        if placed.patch3:
            self._halo_patch3 = placed.patch3[0]
        # the state localizer re-runs after every linearization/history
        # update: re-jit it to emit the pinned shardings directly
        st_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), specs.state)
        self._localize_state = jax.jit(
            self._localize_fn, out_shardings=st_sh
        )
        self._args_cache = placed
        self._args_state_src = self.op.state

    def _args_specs(self) -> HaloArgs:
        """PartitionSpec pytree matching ``vmult_args`` (P(AXIS) on every
        device-major leaf, P() on replicated tables)."""
        def spec(x):
            return P(AXIS) if (
                hasattr(x, "ndim") and x.ndim >= 1
                and x.shape[0] == self.n_dev
            ) else P()

        batch_s = CellBatch(
            S=P(), D=P(), jinv=P(AXIS), jxw=P(AXIS),
            cell_nodes=P(AXIS), h_min_vertex=P(AXIS), h_q=P(AXIS),
            node_gather=(),
        )
        faces_s = tuple(
            HaloFaceBlock(
                S=P(), D=P(), nodes=P(AXIS), jxw=P(AXIS),
                normals=P(AXIS), jinv=P(AXIS), beta_eff=P(AXIS),
                is_cut=P(AXIS), is_nitsche=P(AXIS), src=P(AXIS),
            )
            for _ in self.face_blocks
        )
        state_s = jax.tree_util.tree_map(spec, self._local_state())
        ca_s = ConstraintArrays(
            rows=P(AXIS), cols=P(AXIS), weights=P(AXIS), inhom=P(AXIS)
        )
        prism_s = ()
        if self._halo_prism is not None:
            from ns_gls_tpu.ops.prism import PrismTables
            from ns_gls_tpu.parallel.halo_prism import HaloPrismArgs

            # explicit specs (NOT shape-sniffed: a replicated band's row
            # count can coincide with n_dev)
            tab_s = PrismTables(
                band_S=P(), band_D=P(), bx_S=P(), bx_D=P(),
                bx_ST=P(), bx_DT=P(), S1=P(), D1=P(), wz=P(),
                jinv2=P(AXIS), jxw2=P(AXIS), h=P(AXIS),
                gather_nodes=P(AXIS),
                compress=tuple(P(AXIS) for _ in
                               self._halo_prism.tables.compress),
            )
            prism_s = (HaloPrismArgs(tables=tab_s, oslot=P(AXIS)),)
        patch2_s = ()
        if self._halo_patch2 is not None:
            from ns_gls_tpu.ops.patch2d import Patch2DTables
            from ns_gls_tpu.parallel.halo_patch2d import HaloPatch2DArgs

            tab2_s = Patch2DTables(
                bx_S=P(), bx_D=P(), bx_ST=P(), bx_DT=P(),
                by_S=P(), by_D=P(), by_ST=P(), by_DT=P(),
                jinv=P(AXIS), jxw=P(AXIS), h=P(AXIS),
                gather_nodes=P(AXIS),
                compress=tuple(P(AXIS) for _ in
                               self._halo_patch2.tables.compress),
            )
            patch2_s = (HaloPatch2DArgs(tables=tab2_s, oslot=P(AXIS)),)
        patch3_s = ()
        if self._halo_patch3 is not None:
            from ns_gls_tpu.ops.patch3d import Patch3DTables
            from ns_gls_tpu.parallel.halo_patch3d import HaloPatch3DArgs

            tab3_s = Patch3DTables(
                bx_S=P(), bx_D=P(), bx_ST=P(), bx_DT=P(),
                bz_S=P(), bz_D=P(), bz_ST=P(), bz_DT=P(),
                S1=P(), D1=P(),
                jinv=P(AXIS), jxw=P(AXIS), h=P(AXIS),
                gather_nodes=P(AXIS),
                compress=tuple(P(AXIS) for _ in
                               self._halo_patch3.tables.compress),
            )
            patch3_s = (HaloPatch3DArgs(tables=tab3_s, oslot=P(AXIS)),)
        return HaloArgs(batch_s, faces_s, state_s, ca_s, ca_s, ca_s,
                        prism_s, patch2_s, patch3_s)

    def _args_template(self):
        return HaloArgs(
            batch=self.batch,
            faces=self.face_blocks,
            state=self._local_state(),
            cstr_h=self._cstr_h,
            cstr_own=self._cstr_own,
            cstr_i=self._cstr_i,
            prism=(self._halo_prism,) if self._halo_prism is not None
            else (),
            patch2=(self._halo_patch2,) if self._halo_patch2 is not None
            else (),
            patch3=(self._halo_patch3,) if self._halo_patch3 is not None
            else (),
        )

    # ------------------------------------------------------------------
    @property
    def vmult_args(self) -> HaloArgs:
        """Cached localized-args pytree: rebuilt only after
        linearization / history / constraint updates.  The Jacobian
        solve reads this every Newton iteration — rebuilding each time
        reintroduced the per-step dispatch storm on the multi-chip path
        (round-3 review weak #3)."""
        if (self._args_cache is None
                or self._args_state_src is not self.op.state):
            # identity check on the wrapped state pytree: every
            # linearization/history/weight mutation REPLACES op.state
            # (NamedTuple), so `is` catches them all — including direct
            # ``op.state =`` writes that never touch this wrapper's
            # delegates (the MG level-apply wrappers receive no delegate
            # calls at all; without this check their caches served the
            # CONSTRUCTION-time linearization to every V-cycle)
            self._args_cache = self._args_template()
            self._args_state_src = self.op.state
        return self._args_cache

    def vmult(self, u):
        return self.to_global(self._vmult(self.vmult_args, self.to_dist(u)))

    def evaluate_residual(self, u):
        return self.to_global(
            self._residual(self.vmult_args, self.to_dist(u))
        )

    def evaluate_rhs(self):
        zero = jnp.zeros((self.n_nodes, self.n_comp), self.dtype)
        return self.evaluate_residual(zero)

    # -- OperatorBase surface delegated to the wrapped operator ----------
    # (every delegate that can change op.state invalidates the cached
    # localized args)
    def set_linearization_point(self, u):
        self.op.set_linearization_point(u)
        self._args_cache = None

    def set_previous_solution(self, history):
        self.op.set_previous_solution(history)
        self._args_cache = None

    def invalidate_system(self):
        self.op.invalidate_system()
        self._args_cache = None

    def update_weight(self):
        self.op.update_weight()
        self._args_cache = None

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
        self._set_cstr_inhom(value)

    @property
    def outflow_bcs_nitsche(self):
        return self.op.outflow_bcs_nitsche

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


class HaloTransferArgs(NamedTuple):
    """Dynamic pytree of a distributed two-level transfer (device-major)."""

    fill_src: jnp.ndarray   # (n_dev, Lf) coarse owned slots (local copies)
    fill_dst: jnp.ndarray   # (n_dev, Lf) window slots
    sends: tuple            # per round: (n_dev, Lr) coarse owned slots
    recvs: tuple            # per round: (n_dev, Lr) window slots
    cols: jnp.ndarray       # (n_dev, n_own_f_max, K) window slots
    wts: jnp.ndarray        # (n_dev, n_own_f_max, K)


class HaloTransferOps:
    """Distributed two-level MG transfer between the node layouts of a
    coarse and a fine :class:`HaloShardedOperator`.

    TPU-native equivalent of the *distributed* ``MGTwoLevelTransfer``
    (``main.cc:540-567``): prolongation gathers the coarse values each
    device needs into a transfer-local window (one ``ppermute`` round per
    SFC-neighbor distance, payload O(window)), then evaluates the
    embedding weights on owned fine nodes; restriction is the exact
    transpose (scatter into the window, reverse exchange, add at the
    coarse owners).  Communication volume is O(inter-device interface),
    independent of N — the V-cycle never touches a replicated vector
    above the coarse solve.
    """

    def __init__(self, t, coarse: "HaloShardedOperator",
                 fine: "HaloShardedOperator"):
        n_dev = fine.n_dev
        assert coarse.n_dev == n_dev
        self.mesh = fine.mesh
        self.n_own_c = coarse.n_own_max
        self.n_own_f = fine.n_own_max
        p_cols = np.asarray(t.p_cols)
        p_wts = np.asarray(t.p_wts)
        K = p_cols.shape[1]
        owner_c = coarse.owner
        g2l_c = coarse._g2l

        need = []       # per device: remote coarse nodes, sorted
        w2l = {}        # (d, node) -> window slot
        n_need = []
        for d in range(n_dev):
            ofd = fine.own_lists[d]
            cd = p_cols[ofd]
            wd = p_wts[ofd]
            nodes = np.unique(cd[wd != 0.0]) if len(ofd) else np.empty(
                0, np.int64
            )
            for i, nd in enumerate(nodes):
                w2l[(d, int(nd))] = i
            n_need.append(len(nodes))
            need.append(nodes)
        self.n_win = n_win = max(max(n_need, default=0), 1)

        # local fills (window slots whose coarse node is owned here)
        Lf = max(
            (int((owner_c[nd] == d).sum()) for d, nd in enumerate(need)),
            default=0,
        )
        Lf = max(Lf, 1)
        fill_src = np.zeros((n_dev, Lf), np.int64)
        fill_dst = np.full((n_dev, Lf), n_win, np.int64)
        for d in range(n_dev):
            mine = need[d][owner_c[need[d]] == d]
            fill_src[d, : len(mine)] = g2l_c[d, mine]
            fill_dst[d, : len(mine)] = [w2l[(d, int(n))] for n in mine]

        # exchange rounds (delta = receiver - owner), as in the halo plan
        plans = {}
        for d in range(n_dev):
            rem = need[d][owner_c[need[d]] != d]
            og = owner_c[rem]
            for o in np.unique(og):
                plans.setdefault(int(d - o), {})[int(o)] = rem[og == o]
        self._pairs = []
        sends, recvs = [], []
        for delta in sorted(plans):
            by_src = plans[delta]
            L = max(len(v) for v in by_src.values())
            send = np.zeros((n_dev, L), np.int64)
            recv = np.full((n_dev, L), n_win, np.int64)
            pairs = []
            for o, nodes in sorted(by_src.items()):
                send[o] = _pad_rows(g2l_c[o, nodes], L, 0)
                recv[o + delta] = _pad_rows(
                    np.array(
                        [w2l[(o + delta, int(n))] for n in nodes], np.int64
                    ),
                    L, n_win,
                )
                pairs.append((o, o + delta))
            self._pairs.append(tuple(pairs))
            sends.append(jnp.asarray(send.astype(np.int32)))
            recvs.append(jnp.asarray(recv.astype(np.int32)))

        # embedding maps on owned fine nodes, window-slot numbering
        cols = np.full((n_dev, fine.n_own_max, K), n_win, np.int64)
        wts = np.zeros((n_dev, fine.n_own_max, K), p_wts.dtype)
        for d in range(n_dev):
            ofd = fine.own_lists[d]
            cd = p_cols[ofd]
            wd = p_wts[ofd]
            loc = np.full(cd.shape, n_win, np.int64)
            for i in range(len(ofd)):
                for k in range(K):
                    if wd[i, k] != 0.0:
                        loc[i, k] = w2l[(d, int(cd[i, k]))]
            cols[d, : len(ofd)] = loc
            wts[d, : len(ofd)] = wd
        self.args = HaloTransferArgs(
            fill_src=jnp.asarray(fill_src.astype(np.int32)),
            fill_dst=jnp.asarray(fill_dst.astype(np.int32)),
            sends=tuple(sends),
            recvs=tuple(recvs),
            cols=jnp.asarray(cols.astype(np.int32)),
            wts=jnp.asarray(wts),
        )
        self._build()

    def _build(self):
        n_win = self.n_win
        n_own_c = self.n_own_c
        pairs_all = self._pairs
        spec = HaloTransferArgs(
            fill_src=P(AXIS), fill_dst=P(AXIS),
            sends=tuple(P(AXIS) for _ in pairs_all),
            recvs=tuple(P(AXIS) for _ in pairs_all),
            cols=P(AXIS), wts=P(AXIS),
        )

        def fill_window(a: HaloTransferArgs, u):
            # u: (1, n_own_c, C) shard -> window (n_win+1, C), trash last
            C = u.shape[-1]
            win = jnp.zeros((n_win + 1, C), u.dtype)
            win = win.at[a.fill_dst[0]].set(u[0][a.fill_src[0]])
            for pairs, snd, rcv in zip(pairs_all, a.sends, a.recvs):
                buf = u[0][snd[0]]
                buf = jax.lax.ppermute(buf, AXIS, perm=list(pairs))
                win = win.at[rcv[0]].set(buf)
            return win.at[n_win].set(0.0)

        def prolongate_local(a: HaloTransferArgs, u):
            win = fill_window(a, u)
            uf = jnp.einsum(
                "nkc,nk->nc", win[a.cols[0]], a.wts[0].astype(u.dtype)
            )
            return uf[None]

        def restrict_local(a: HaloTransferArgs, r):
            C = r.shape[-1]
            win = jnp.zeros((n_win + 1, C), r.dtype)
            win = win.at[a.cols[0]].add(
                r[0][:, None, :] * a.wts[0][..., None].astype(r.dtype)
            )
            rc = jnp.zeros((n_own_c + 1, C), r.dtype)
            rc = rc.at[a.fill_src[0]].add(win[a.fill_dst[0]])
            for pairs, snd, rcv in zip(pairs_all, a.sends, a.recvs):
                buf = win[rcv[0]]
                back = [(b, aa) for (aa, b) in pairs]
                buf = jax.lax.ppermute(buf, AXIS, perm=back)
                # devices without a partner in this round receive zeros;
                # snd pads point at slot 0 and carry zero payload
                rc = rc.at[snd[0]].add(buf)
            return rc[:n_own_c][None]

        mesh = self.mesh
        self.prolongate_pure = jax.shard_map(
            prolongate_local, mesh=mesh, in_specs=(spec, P(AXIS)),
            out_specs=P(AXIS), check_vma=False,
        )
        self.restrict_pure = jax.shard_map(
            restrict_local, mesh=mesh, in_specs=(spec, P(AXIS)),
            out_specs=P(AXIS), check_vma=False,
        )
