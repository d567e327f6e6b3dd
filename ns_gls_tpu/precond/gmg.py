"""Geometric multigrid preconditioner (global-coarsening flavor).

TPU-native re-design of the reference ``PreconditionerGMG``
(``multigrid.{h,cc}``, driver setup ``main.cc:396-568``):

- V-cycle over the uniform-refinement hierarchy, level operators in reduced
  precision (MGNumber=float, ``config.h:7``; here f32 by default),
- point-Jacobi relaxation smoother, `n_iterations` sweeps, damping from a
  power-iteration eigenvalue estimate with `smoothing_range`
  (deal.II ``PreconditionRelaxation``; ``multigrid.cc:281-305,353-370``),
- pluggable coarse solver: dense-LU "direct" (f64, replicated — replaces
  Trilinos SolverDirect), "identity", or iterative GMRES wrapping the LU
  (``multigrid.cc:372-532``); the float<->double shim of
  ``multigrid.cc:113-136`` becomes dtype casts around the coarse solve.

The whole V-cycle is ONE jitted pure function of the dynamic per-level
state (operator linearization tables, inverse diagonals, relaxation
factors, coarse LU), so Newton-step state updates never recompile it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ns_gls_tpu.fem import transfer as tr


class GMGArgs(NamedTuple):
    """Dynamic V-cycle inputs (a pytree)."""

    level_args: tuple        # per level: the operator's vmult_args pytree
    inv_diags: tuple         # (n_nodes_l, C) per level
    omegas: tuple            # () relaxation factor per level
    transfers: tuple         # TwoLevelTransfer per gap (coarse..fine-1)
    coarse_lu: tuple         # (lu, piv) in f64, or ()


class PreconditionerGMG:
    def __init__(
        self,
        level_ops: list,          # NavierStokesOperator per level, coarse->fine
        transfers: list,          # TwoLevelTransfer per gap
        fine_dtype=jnp.float64,
        mg_dtype=jnp.float32,
        smoothing_n_iterations: int = 5,
        smoothing_range: float = 20.0,
        smoothing_eig_n_iterations: int = 20,
        coarse_grid_solver: str = "direct",
        coarse_grid_iterate: bool = False,
        coarse_grid_gmres_reltol: float = 1e-4,
        coarse_amg_default_parameters: bool = True,
        compute_evs_n_levels: int = 0,
        logger=None,
        level_ops_apply: list | None = None,
        transfer_ops: list | None = None,
    ):
        # level_ops: plain per-level operators (assembly, diagonals, the
        # coarse solve). level_ops_apply: optional device-mesh-sharded
        # wrappers used for every HOT apply (smoother vmults, omega power
        # iteration) so the whole V-cycle runs under the same device mesh
        # as the fine-level operator (reference: level-parallel Trilinos
        # matrices, ``main.cc:396-568``).
        self.level_ops = level_ops
        self.level_ops_apply = (
            list(level_ops_apply) if level_ops_apply is not None
            else list(level_ops)
        )
        self.transfers = tuple(transfers)
        # transfer_ops: distributed (halo-layout) transfer objects with
        # prolongate_pure/restrict_pure/args — when given, the whole
        # V-cycle runs on distributed (n_dev, n_own_max, C) vectors with
        # O(interface) ppermute collectives; only the coarse solve
        # gathers to the (small) replicated layout.  Replaces the
        # replicated-transfer path for multi-chip runs
        # (``MGTransferGlobalCoarsening`` on partitioned vectors,
        # ``main.cc:540-567``).
        self.transfer_ops = transfer_ops
        self.distributed = transfer_ops is not None
        self.fine_dtype = fine_dtype
        self.mg_dtype = mg_dtype
        self.n_smooth = smoothing_n_iterations
        self.smoothing_range = smoothing_range
        self.eig_n_iterations = smoothing_eig_n_iterations
        self.coarse_grid_solver = coarse_grid_solver
        self.coarse_grid_iterate = coarse_grid_iterate
        self.coarse_grid_gmres_reltol = coarse_grid_gmres_reltol
        self.coarse_amg_default_parameters = coarse_amg_default_parameters
        self.compute_evs_n_levels = compute_evs_n_levels
        self._coarse_kind = ""
        self.logger = logger
        self.n_levels = len(level_ops)
        self._args: GMGArgs | None = None
        # when the coarse solve is non-iterative, the level-0 operator /
        # smoother args never enter the V-cycle trace; passing them anyway
        # ships a large pruned-parameter pytree, which the remote-AOT TPU
        # compile path mishandles (deterministic worker crash, round-2
        # bisect) — so strip unused slots from the apply args entirely
        self._needs_level0_args = bool(
            coarse_grid_iterate and coarse_grid_solver != "identity"
        ) or self.n_levels == 1

        # build the static V-cycle closure once: level vmult_pure identities
        # are stable for the life of the preconditioner
        level_fns = tuple(op.vmult_pure for op in self.level_ops_apply)
        n_smooth = self.n_smooth
        n_levels = self.n_levels
        coarse_kind = self.coarse_grid_solver
        mgdt = self.mg_dtype
        C = level_ops[0].n_comp

        distributed = self.distributed
        if distributed:
            pro_fns = tuple(t.prolongate_pure for t in self.transfer_ops)
            res_fns = tuple(t.restrict_pure for t in self.transfer_ops)
            # coarse-level distributed<->replicated conversion maps (the
            # coarse problem is small — the reference equally replicates
            # it across ranks, ``multigrid.cc:107-110``)
            og0 = self.level_ops_apply[0]._own_global
            om0 = self.level_ops_apply[0]._own_mask
            n0 = level_ops[0].n_nodes

            def d2g0(rd):
                def per_dev(carry, dev):
                    og, mask, r_own = dev
                    return carry.at[og].add(
                        r_own * mask[:, None].astype(r_own.dtype)
                    ), None

                out = jnp.zeros((n0, C), rd.dtype)
                out, _ = jax.lax.scan(per_dev, out, (og0, om0, rd))
                return out

            def g2d0(r):
                return r[og0] * om0[..., None].astype(r.dtype)

        def coarse_apply(args: GMGArgs, r):
            """One application of the coarse preconditioner: dense LU for
            small coarse problems ("direct"), host-side ILU ("ILU",
            ``multigrid.cc:435-460``), aggregation-AMG V-cycle otherwise
            (the reference's coarse AMG, ``multigrid.cc:372-433``)."""
            if coarse_kind == "identity":
                return r
            if self._coarse_kind == "ilu":
                return self._coarse_ilu.vmult_pure((), r)
            if not args.coarse_lu:
                return r
            if self._coarse_kind == "lu":
                lu, piv = args.coarse_lu
                x = jax.scipy.linalg.lu_solve(
                    (lu, piv), r.reshape(-1).astype(lu.dtype)
                )
                return x.reshape(r.shape).astype(r.dtype)
            # aggregation-AMG V-cycle on the coarse matrix
            return self._coarse_amg.vmult_pure(args.coarse_lu, r)

        def coarse_solve(args: GMGArgs, r):
            if distributed:
                def capply(x):
                    return g2d0(coarse_apply(args, d2g0(x)))
            else:
                def capply(x):
                    return coarse_apply(args, x)

            if not self.coarse_grid_iterate or coarse_kind == "identity":
                return capply(r)
            # iterative coarse solve: GMRES on the coarse level operator
            # preconditioned by coarse_apply (``multigrid.cc:490-532``).
            # On TPU the nested while-loop GMRES inside the V-cycle inside
            # the outer GMRES crashes the worker (PERF.md), so use the
            # statically-bounded fori-loop variant there; iterations past
            # the 1e-4 reltol are masked no-ops.
            tol = self.coarse_grid_gmres_reltol * jnp.linalg.norm(
                r.reshape(-1)
            )
            if jax.default_backend() == "tpu":
                from ns_gls_tpu.solvers.linear import gmres_fixed

                # fori-loop iterations past convergence are masked no-ops
                # but still EXECUTE, so the static cap trades V-cycle
                # quality against guaranteed runtime: 2 cycles (60 its)
                # suffices for every reference config; a coarse problem
                # needing more can raise NS_COARSE_CYCLES up to the CPU
                # cap (10 cycles = 300 its) at proportional cost.
                import os

                n_cyc = int(os.environ.get("NS_COARSE_CYCLES", "2"))
                res = gmres_fixed(
                    level_fns[0], args.level_args[0], r, jnp.zeros_like(r),
                    M=lambda a, x: capply(x), m_args=(),
                    tol=tol, restart=30,
                    n_cycles=n_cyc,
                )
            else:
                from ns_gls_tpu.solvers.linear import gmres

                res = gmres(
                    level_fns[0], args.level_args[0], r, jnp.zeros_like(r),
                    M=lambda a, x: capply(x), m_args=(),
                    tol=tol, restart=30, max_restarts=10,
                )
            return res.x

        # single-device V-cycle vectors are FLAT (n_l*C,): the TPU (8,128)
        # tiling pads the minor C=4 axis of (N, 4) arrays ~7x per
        # elementwise pass, and the smoother update is a fused elementwise
        # op over 5 vector streams — flat layout streams it unpadded.
        # Reshapes appear only at operator/transfer boundaries, where XLA
        # folds them into the transposes those kernels already perform.
        # The distributed path keeps its (n_dev, n_own, C) layout.
        lvl_shapes = tuple((op.n_nodes, C) for op in level_ops)

        def smooth(args, level, x, b):
            inv_d = args.inv_diags[level]
            om = args.omegas[level]
            la = args.level_args[level]
            if distributed:
                def body(_, x):
                    return x + om * inv_d * (b - level_fns[level](la, x))
            else:
                shp = lvl_shapes[level]
                inv_df = inv_d.reshape(-1)

                def body(_, x):
                    Av = level_fns[level](la, x.reshape(shp)).reshape(-1)
                    return x + om * inv_df * (b - Av)

            # rolled loop keeps the HLO small (the V-cycle is inlined into
            # the jitted GMRES; unrolled sweeps blow up remote compile)
            return jax.lax.fori_loop(0, n_smooth, body, x)

        def vcycle_level(args, level, b):
            if level == 0:
                if distributed:
                    return coarse_solve(args, b)
                return coarse_solve(
                    args, b.reshape(lvl_shapes[0])
                ).reshape(-1)
            # pre-smooth from zero initial guess
            x = smooth(args, level, jnp.zeros_like(b), b)
            if distributed:
                d = b - level_fns[level](args.level_args[level], x)
                d_c = res_fns[level - 1](args.transfers[level - 1], d)
                x_c = vcycle_level(args, level - 1, d_c)
                x = x + pro_fns[level - 1](args.transfers[level - 1], x_c)
            else:
                shp = lvl_shapes[level]
                d = b - level_fns[level](
                    args.level_args[level], x.reshape(shp)
                ).reshape(-1)
                d_c = tr.restrict(
                    args.transfers[level - 1], d.reshape(shp)
                ).reshape(-1)
                x_c = vcycle_level(args, level - 1, d_c)
                x = x + tr.prolongate(
                    args.transfers[level - 1],
                    x_c.reshape(lvl_shapes[level - 1]),
                ).reshape(-1)
            return smooth(args, level, x, b)

        def vmult_fn(args: GMGArgs, src):
            b = src.astype(mgdt)
            if not distributed:
                b = b.reshape(-1)
            x = vcycle_level(args, n_levels - 1, b)
            if not distributed:
                x = x.reshape(src.shape)
            return x.astype(src.dtype)

        self.vmult_pure = vmult_fn
        self._vmult = jax.jit(vmult_fn)
        self._estimate_omega = jax.jit(
            self._estimate_omega_impl, static_argnames=("level",)
        )

    def _apply_level_args(self) -> tuple:
        """Per-level operator args for the jitted V-cycle; the level-0
        slot is an empty pytree when the coarse solve never applies the
        level-0 operator (see _needs_level0_args)."""
        la = [op.vmult_args for op in self.level_ops_apply]
        if not self._needs_level0_args:
            la[0] = ()
        return tuple(la)

    # ------------------------------------------------------------------
    def _estimate_omega_impl(self, la, inv_diag, level: int):
        """Power iteration for lambda_max(D^{-1} A); relaxation =
        2 / (lambda_max * (1 + 1/smoothing_range)) — deal.II
        PreconditionRelaxation semantics (``multigrid.cc:281-305``)."""
        fn = self.level_ops_apply[level].vmult_pure
        key = jax.random.PRNGKey(31 + level)
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
        lam_max = 1.2 * lam  # deal.II-style safety factor on the estimate
        lam_min = lam_max / self.smoothing_range
        return 2.0 / (lam_min + lam_max)

    def _refresh_smoother_state(self, with_omega: bool = True):
        """Fused single-dispatch refresh of the per-level smoother state:
        inverse diagonals, plus the power-method relaxation factors when
        ``with_omega`` (the omega estimate costs ``eig_n_iterations``
        level vmults per level — NS_OMEGA_REFRESH=N lets ``initialize``
        reuse omegas for N-1 rebuilds).  On the distributed V-cycle the
        same dispatch also scatters each diagonal into the halo layout
        and runs the power method there (the per-level sequence was ~3
        launches per level per rebuild)."""
        from ns_gls_tpu.ops.assembly import diagonal_kernel

        attr = "_refresh_fn" if with_omega else "_refresh_fn_dg"
        fn = getattr(self, attr, None)
        distributed = self.distributed
        if fn is None:
            lvls = [
                lvl for lvl in range(self.n_levels)
                if not (lvl == 0 and not self._needs_level0_args)
            ]
            kernels = [diagonal_kernel(self.level_ops[lvl])[0]
                       for lvl in lvls]
            to_dist = ([self.level_ops_apply[lvl].to_dist for lvl in lvls]
                       if distributed else None)

            def impl(diag_args, level_args):
                outs = []
                for i, lvl in enumerate(lvls):
                    d = kernels[i](*diag_args[i])
                    dinv = jnp.where(jnp.abs(d) > 1e-10, 1.0 / d, 1.0)
                    dapp = to_dist[i](dinv) if distributed else dinv
                    if with_omega:
                        om = self._estimate_omega_impl(
                            level_args[i], dapp, lvl
                        )
                        outs.append((dinv, dapp, om))
                    else:
                        outs.append((dinv, dapp))
                return tuple(outs)

            fn = jax.jit(impl)
            setattr(self, attr, fn)
            self._refresh_lvls = lvls
        from ns_gls_tpu.ops.assembly import _diag_args

        lvls = self._refresh_lvls
        return fn(
            tuple(_diag_args(self.level_ops[lvl]) for lvl in lvls),
            tuple(self.level_ops_apply[lvl].vmult_args for lvl in lvls),
        )

    def initialize(self):
        """Recompute dynamic state: inverse diagonals, relaxation factors,
        coarse factorization (called per Newton step,
        ``setup_preconditioner``, ``main.cc:815-839``)."""
        from ns_gls_tpu.ops.assembly import assemble_dense, compute_inverse_diagonal
        from ns_gls_tpu.utils.timer import timer

        inv_diags = []
        inv_diags_apply = []
        omegas = []
        # ONE jitted dispatch refreshes every level's inverse
        # diagonal AND relaxation factor (the per-level calls cost
        # ~2 device round trips per level per step on the tunnel);
        # omegas stay device scalars in GMGArgs.  On the distributed
        # V-cycle the smoother state lives in the halo layout (the
        # diagnostics below still read the global copy).
        # NS_OMEGA_REFRESH=N reuses the power-method omegas for N-1
        # rebuilds (they drift slowly with the linearization point;
        # the damping factor only shapes smoother convergence, never
        # the converged answer) — the diagonals still refresh every
        # rebuild since they enter the smoother directly.
        import os

        n_om = int(os.environ.get("NS_OMEGA_REFRESH", "1"))
        cache = getattr(self, "_omega_cache", None)
        self._init_counter = getattr(self, "_init_counter", -1) + 1
        reuse = (n_om > 1 and cache is not None
                 and self._init_counter % n_om != 0)
        with timer("mg_init::smoother_state"):
            outs = self._refresh_smoother_state(with_omega=not reuse)
        it = iter(outs)
        for lvl in range(self.n_levels):
            if lvl == 0 and not self._needs_level0_args:
                inv_diags.append(())
                inv_diags_apply.append(())
                omegas.append(())
                continue
            tup = next(it)
            om = cache[lvl] if reuse else tup[2]
            inv_diags.append(tup[0])
            inv_diags_apply.append(tup[1])
            omegas.append(om)
        self._omega_cache = omegas

        coarse_lu = ()
        n_coarse = self.level_ops[0].n_nodes * self.level_ops[0].n_comp
        if self.coarse_grid_solver == "ILU":
            # host-side SuperLU ILU on the assembled coarse matrix
            # (``multigrid.cc:435-460`` Trilinos ILU coarse solver)
            from ns_gls_tpu.precond.ilu import PreconditionerILU

            if not hasattr(self, "_coarse_ilu"):
                self._coarse_ilu = PreconditionerILU(self.level_ops[0])
            self._coarse_ilu.initialize()
            self._coarse_kind = "ilu"
        elif self.coarse_grid_solver in ("direct", "AMG"):
            if self.coarse_grid_solver == "direct" and n_coarse <= 8000:
                from ns_gls_tpu.ops.assembly import assemble_dense_device

                # device-side assembly + CᵀAC sandwich (one dispatch —
                # the host path downloaded element matrices and looped
                # cells in numpy on every rebuild)
                with timer("mg_init::coarse_lu"):
                    A = assemble_dense_device(self.level_ops[0])
                    # TPU's LuDecomposition HLO implements only F32; the
                    # coarse solve is an f32-V-cycle component anyway, so
                    # factor in f32 there and keep f64 on CPU
                    lu_dt = (
                        jnp.float64 if jax.default_backend() == "cpu"
                        else jnp.float32
                    )
                    lu, piv = jax.scipy.linalg.lu_factor(A.astype(lu_dt))
                coarse_lu = (lu, piv)
                self._coarse_kind = "lu"
            else:
                # large coarse problems / AMG requests: aggregation AMG on
                # the assembled coarse matrix (all-device apply); "use
                # default parameters" false = the reference's tuned ML set
                # (``multigrid.cc:398-433``) -> stronger aggregation here
                from ns_gls_tpu.precond.amg import PreconditionerAMG

                if not hasattr(self, "_coarse_amg"):
                    kw = (
                        {}
                        if self.coarse_amg_default_parameters
                        else {"theta": 0.02, "n_smooth": 3,
                              "max_coarse": 1000}
                    )
                    self._coarse_amg = PreconditionerAMG(
                        self.level_ops[0], matrix_free_fine=True, **kw
                    )
                with timer("mg_init::coarse_amg"):
                    self._coarse_amg.initialize()
                coarse_lu = self._coarse_amg.vmult_args
                self._coarse_kind = "amg"

        # level-matrix eigenvalue diagnostics (``multigrid.cc:307-345``)
        for lvl in range(min(self.compute_evs_n_levels, self.n_levels)):
            if lvl == 0 and not self._needs_level0_args:
                continue
            op_l = self.level_ops[lvl]
            n_l = op_l.n_nodes * op_l.n_comp
            if n_l > 6000:
                if self.logger:
                    self.logger(
                        f"    [M]  - level: {lvl}: skipping eigenvalues"
                        f" ({n_l} dofs too large for dense analysis)"
                    )
                continue
            A = assemble_dense(op_l)
            D = np.asarray(inv_diags[lvl]).reshape(-1)
            evs = np.sort(np.linalg.eigvals(D[:, None] * A).real)
            if self.logger:
                self.logger(
                    f"    [M]  - level: {lvl}, ev_n: {len(evs)},"
                    f" ev_min: {evs[0]:.4g}, ev_max: {evs[-1]:.4g}"
                )

        self._args = GMGArgs(
            level_args=self._apply_level_args(),
            inv_diags=tuple(inv_diags_apply),
            omegas=tuple(omegas),
            transfers=(
                tuple(t.args for t in self.transfer_ops)
                if self.distributed else self.transfers
            ),
            coarse_lu=coarse_lu,
        )
        if self.logger:
            for lvl, om in enumerate(omegas):
                self.logger(
                    f"    [M]  - level: {lvl}, omega: {float(om):.4f}"
                )

    # ------------------------------------------------------------------
    @property
    def vmult_args(self) -> GMGArgs:
        if self._args is None:
            self.initialize()
        return self._args._replace(
            level_args=self._apply_level_args()
        )

    def vmult(self, x):
        return self._vmult(self.vmult_args, x)

    def print_stats(self):
        pass
