"""Local-smoothing geometric multigrid (the reference's "GMG-LS").

Re-design of the reference's second multigrid flavor
(``main.cc:569-732``: per-p4est-level float operators with ``mg_level``
tags, ``MGConstrainedDoFs`` refinement-edge bookkeeping, and the
interface corrections ``operator_ns.cc:734-787``) in the TPU-native
framework.  Differences from the global-coarsening GMG
(``precond/gmg.py``), visible only on adaptively refined meshes:

- the hierarchy is the refinement FOREST: level ``l`` consists of the
  cells at refinement level ``l`` (``mesh/forest.py``), covering only
  the part of the domain refined that far — not the full-domain
  generation chain,
- smoothing touches only the dofs interior to a level's region: rows on
  the refinement edge (interface to coarser active cells) are masked in
  the Jacobi update, so the level correction is conforming by zero
  extension,
- the interface coupling is carried by the TRUE level residual
  ``d - A_l x`` (the operator keeps physical constraints only, NOT the
  edge rows) — its edge rows are exactly the fine-side flux the
  reference moves with ``vmult_interface_down``, and the level-to-level
  restriction hands them to the coarser level where those dofs are
  smoothed,
- the global defect is injected at each dof's COARSEST active level
  (edge dofs belong to the coarse side; hanging-position edge nodes are
  constrained globally and enter nowhere), and the solution is collected
  finest-level-last so hanging positions read the prolongated
  (constraint-consistent) values.

On globally refined meshes every level covers the domain, the edge sets
are empty, and the cycle degenerates to exactly the global-coarsening
V-cycle — tested against it.  Multi-chip runs use the GC flavor (the
reference equally restricts GMG-LS to its non-benchmark configs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ns_gls_tpu.fem import transfer as tr


class PreconditionerGMGLS:
    def __init__(
        self,
        level_ops: list,        # NavierStokesOperator per forest level
        transfers: list,        # TwoLevelTransfer per gap (level meshes)
        inj_maps: list,         # per level: (rows_l, src_fin) defect injection
        copy_maps: list,        # per level: (rows_l, dst_fin) solution collect
        int_masks: list,        # per level: (n_nodes_l, 1) 0 on refinement edge
        constrained_rows=None,  # global dof rows constrained in the OUTER
                                # system (hanging/Dirichlet): the Krylov
                                # system carries them as identity rows, so
                                # the preconditioner must act as identity
                                # there — NOT return the conforming
                                # interpolated value (which is what the
                                # level prolongations produce at hanging
                                # positions and what poisoned GMRES)
        n_fine_nodes: int = 0,
        fine_dtype=jnp.float32,
        mg_dtype=jnp.float32,
        smoothing_n_iterations: int = 5,
        smoothing_range: float = 20.0,
        smoothing_eig_n_iterations: int = 20,
        coarse_grid_solver: str = "direct",
        logger=None,
    ):
        self.level_ops = level_ops
        self.transfers = tuple(transfers)
        self.mg_dtype = mg_dtype
        self.n_smooth = smoothing_n_iterations
        self.smoothing_range = smoothing_range
        self.eig_n_iterations = smoothing_eig_n_iterations
        self.coarse_grid_solver = coarse_grid_solver
        self.logger = logger
        self.n_levels = len(level_ops)
        self._args = None
        C = level_ops[0].n_comp
        mgdt = mg_dtype

        inj = [
            (jnp.asarray(r.astype(np.int32)), jnp.asarray(s.astype(np.int32)))
            for r, s in inj_maps
        ]
        cpy = [
            (jnp.asarray(r.astype(np.int32)), jnp.asarray(s.astype(np.int32)))
            for r, s in copy_maps
        ]
        masks = [jnp.asarray(m, mgdt) for m in int_masks]
        level_fns = tuple(op.vmult_pure for op in level_ops)
        level_sizes = [op.n_nodes for op in level_ops]
        n_levels = self.n_levels
        n_smooth = self.n_smooth

        def coarse_solve(largs, r):
            coarse_lu, level_args, _, _ = largs
            if coarse_grid_solver == "identity":
                return r
            if coarse_grid_solver == "AMG":
                # aggregation-AMG V-cycle on the assembled coarse matrix
                # (the reference's GMG-LS coarse, rotation.json)
                return self._coarse_amg.vmult_pure(coarse_lu, r)
            lu, piv = coarse_lu
            x = jax.scipy.linalg.lu_solve(
                (lu, piv), r.reshape(-1).astype(lu.dtype)
            )
            return x.reshape(r.shape).astype(r.dtype)

        def smooth(largs, level, x, b):
            _, level_args, inv_diags, omegas = largs
            inv_d = inv_diags[level]
            om = omegas[level]
            la = level_args[level]
            m = masks[level]

            def body(_, x):
                return x + om * inv_d * (
                    m * (b - level_fns[level](la, x))
                )

            return jax.lax.fori_loop(0, n_smooth, body, x)

        def cycle(largs, level, d, prefill, x_fin):
            if level == 0:
                x0 = coarse_solve(largs, d)
                rows, dst = cpy[0]
                x_fin = x_fin.at[dst].set(x0[rows])
                return x0, x_fin
            _, level_args, _, _ = largs
            x = smooth(largs, level, jnp.zeros_like(d), d)
            # full-row residual: edge rows carry the fine-side interface
            # flux (the vmult_interface_down payload) down to the level
            # where those dofs are smoothed
            t = d - level_fns[level](level_args[level], x)
            d_c = prefill[level - 1] + tr.restrict(
                self.transfers[level - 1], t
            )
            x_c, x_fin = cycle(largs, level - 1, d_c, prefill, x_fin)
            x = x + tr.prolongate(self.transfers[level - 1], x_c)
            x = smooth(largs, level, x, d)
            rows, dst = cpy[level]
            x_fin = x_fin.at[dst].set(x[rows])
            return x, x_fin

        c_rows = (
            jnp.asarray(np.asarray(constrained_rows).astype(np.int32))
            if constrained_rows is not None and len(constrained_rows)
            else None
        )

        def vmult_fn(args, src):
            coarse_lu, level_args, inv_diags, omegas = args
            b = src.astype(mgdt)
            prefill = []
            for l in range(n_levels):
                rows, sf = inj[l]
                d = jnp.zeros((level_sizes[l], C), mgdt)
                prefill.append(d.at[rows].set(b[sf]))
            x_fin = jnp.zeros((n_fine_nodes, C), mgdt)
            _, x_fin = cycle(
                args, n_levels - 1, prefill[n_levels - 1], prefill, x_fin
            )
            if c_rows is not None:
                xf = x_fin.reshape(-1)
                x_fin = xf.at[c_rows].set(
                    b.reshape(-1)[c_rows]
                ).reshape(x_fin.shape)
            return x_fin.astype(src.dtype)

        self.vmult_pure = vmult_fn
        self._vmult = jax.jit(vmult_fn)
        self._estimate_omega = jax.jit(
            self._estimate_omega_impl, static_argnames=("level",)
        )
        self._masks = masks

    # ------------------------------------------------------------------
    def _estimate_omega_impl(self, la, inv_diag, level: int):
        fn = self.level_ops[level].vmult_pure
        key = jax.random.PRNGKey(47 + level)
        v = jax.random.normal(key, inv_diag.shape, inv_diag.dtype)
        v = v / jnp.linalg.norm(v.reshape(-1))

        def body(_, carry):
            v, lam = carry
            w = inv_diag * fn(la, v)
            nrm = jnp.linalg.norm(w.reshape(-1))
            return (w / nrm, nrm)

        _, lam = jax.lax.fori_loop(
            0, self.eig_n_iterations, body, (v, jnp.asarray(1.0, v.dtype))
        )
        lam_max = 1.2 * lam
        lam_min = lam_max / self.smoothing_range
        return 2.0 / (lam_min + lam_max)

    def _refresh_smoother_state(self):
        """Fused single-dispatch refresh of (inv_diag, omega) for every
        level (same treatment as PreconditionerGMG)."""
        from ns_gls_tpu.ops.assembly import _diag_args, diagonal_kernel

        fn = getattr(self, "_refresh_fn", None)
        if fn is None:
            kernels = [diagonal_kernel(op)[0] for op in self.level_ops]

            def impl(diag_args, level_args):
                outs = []
                for lvl, k in enumerate(kernels):
                    d = k(*diag_args[lvl])
                    dinv = jnp.where(jnp.abs(d) > 1e-10, 1.0 / d, 1.0)
                    om = self._estimate_omega_impl(
                        level_args[lvl], dinv, lvl
                    )
                    outs.append((dinv, om))
                return tuple(outs)

            fn = jax.jit(impl)
            self._refresh_fn = fn
        return fn(
            tuple(_diag_args(op) for op in self.level_ops),
            tuple(op.vmult_args for op in self.level_ops),
        )

    def initialize(self):
        from ns_gls_tpu.ops.assembly import assemble_dense_device
        from ns_gls_tpu.utils.timer import timer

        with timer("mg_ls_init::smoother_state"):
            outs = self._refresh_smoother_state()
        inv_diags = [d for d, _ in outs]
        omegas = [om for _, om in outs]

        coarse_lu = ()
        if self.coarse_grid_solver == "AMG":
            from ns_gls_tpu.precond.amg import PreconditionerAMG

            if not hasattr(self, "_coarse_amg"):
                self._coarse_amg = PreconditionerAMG(
                    self.level_ops[0], matrix_free_fine=True,
                    theta=0.02, n_smooth=3, max_coarse=1000,
                )
            self._coarse_amg.initialize()
            coarse_lu = self._coarse_amg.vmult_args
        elif self.coarse_grid_solver != "identity":
            with timer("mg_ls_init::coarse_lu"):
                A = assemble_dense_device(self.level_ops[0])
                lu_dt = (
                    jnp.float64 if jax.default_backend() == "cpu"
                    else jnp.float32
                )
                lu, piv = jax.scipy.linalg.lu_factor(A.astype(lu_dt))
            coarse_lu = (lu, piv)

        self._args = (
            coarse_lu,
            tuple(op.vmult_args for op in self.level_ops),
            tuple(inv_diags),
            tuple(omegas),
        )

    @property
    def vmult_args(self):
        if self._args is None:
            self.initialize()
        coarse_lu, _, inv_diags, omegas = self._args
        return (
            coarse_lu,
            tuple(op.vmult_args for op in self.level_ops),
            inv_diags,
            omegas,
        )

    def vmult(self, x):
        return self._vmult(self.vmult_args, x)

    def print_stats(self):
        pass
