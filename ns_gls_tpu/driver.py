"""Simulation driver: config -> setup -> time loop.

The TPU re-design of the reference ``Driver<dim>`` (``main.cc:199-1052``):
builds the mesh/space/constraints, the NS operator, the preconditioner
(GMG hierarchy with per-level operators in reduced precision), linear and
nonlinear solvers wired through callbacks, then runs the CFL-controlled
time loop with VTU output and case postprocessing.
"""

from __future__ import annotations

import os
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from ns_gls_tpu.config import Parameters
from ns_gls_tpu.fem.constraints import (
    AffineConstraints,
    ConstraintArrays,
    distribute,
)
from ns_gls_tpu.fem.space import FESpace
from ns_gls_tpu.fem.transfer import build_transfer, interpolate_to_coarse
from ns_gls_tpu.models import make_simulation
from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
from ns_gls_tpu.ops.time_integration import SolutionHistory, make_time_integrator
from ns_gls_tpu.precond.gmg import PreconditionerGMG
from ns_gls_tpu.precond.jacobi import PreconditionerIdentity, PreconditionerJacobi
from ns_gls_tpu.solvers.linear import (
    LinearSolverDirect,
    LinearSolverGMRES,
    LinearSolverRichardson,
)
from ns_gls_tpu.solvers.nonlinear import make_nonlinear_solver
from ns_gls_tpu.utils.timer import timer
from ns_gls_tpu.utils.logging import get_logger


def pressure_pin_candidates(space) -> np.ndarray:
    """Node indices at ROOT-mesh vertex positions, in lexicographic
    position order.

    The pressure pin must land on the SAME physical point on the fine
    level and on every multigrid level (``main.cc:453-477`` pins the
    coarse level; we pin the fine level too, see ConstraintSetBuilder):
    a fine pin whose position no level pins leaves the constant-pressure
    mode inconsistently gauged between the system and the V-cycle, which
    degrades GMRES catastrophically (observed on the rotation config
    when the patch numbering moved "node 0").  Root vertices persist on
    every refinement level and are numbering-independent, so selecting
    by root-vertex position makes every level agree."""
    mesh = space.mesh
    root = mesh
    while root.prev is not None:
        root = root.prev
    rv = np.round(np.asarray(root.vertices, np.float64), 9)
    rv = rv[np.lexsort(rv.T[::-1])]          # lexicographic by (x, y[, z])
    pos = np.round(np.asarray(space.node_pos, np.float64), 9)
    lut = {tuple(p): i for i, p in reversed(list(enumerate(pos)))}
    return np.array(
        [lut[tuple(p)] for p in rv if tuple(p) in lut], dtype=np.int64
    )


class ConstraintSetBuilder:
    """Builds the reference's three constraint sets (``main.cc:258-310``):
    - 'full'          : hom. DBCs + pressure pins + slip + periodic
    - 'homogeneous'   : full + inhom.-DBC boundaries zeroed
    - 'inhomogeneous' : full + inhom. DBC values at time t (rebuilt cheaply
                        each step by swapping the inhom value vector)
    """

    def __init__(self, space: FESpace, bcs, dtype):
        self.space = space
        self.bcs = bcs
        self.dtype = dtype
        dim = space.dim
        self.vel_comps = list(range(dim))

        from ns_gls_tpu.fem.hanging import hanging_node_constraints

        hanging = hanging_node_constraints(space)

        # all-Dirichlet problems (e.g. the rotation case) have a floating
        # constant-pressure mode: pin one pressure dof so every level's
        # system is nonsingular (the reference leaves the fine level
        # singular and relies on Krylov behavior; pinning is equivalent up
        # to the constant and far more robust)
        pin_pressure = not (
            bcs.all_homogeneous_nbcs
            or bcs.all_outflow_bcs_cut
            or bcs.all_outflow_bcs_nitsche
        )

        def build(include_inhom_rows: bool):
            b = AffineConstraints(space.n_nodes, dim + 1)
            for bid in bcs.all_homogeneous_dbcs:
                b.add_dirichlet(space.boundary_nodes([bid]), self.vel_comps)
            for bid in bcs.all_homogeneous_nbcs:
                b.add_dirichlet(space.boundary_nodes([bid]), [dim])
            for bid in bcs.all_slip_bcs:
                nodes, normals = space.boundary_node_normals([bid])
                b.add_no_normal_flux(nodes, normals)
            for b0, b1, direction in bcs.periodic_bcs:
                na, nb = self._match_periodic(b0, b1, direction)
                b.add_periodic(na, nb, list(range(dim + 1)))
            if include_inhom_rows:
                for bid, _fn in bcs.all_inhomogeneous_dbcs:
                    b.add_dirichlet(space.boundary_nodes([bid]), self.vel_comps)
            # hanging nodes last (reference order, ``main.cc:273-293``)
            for node, masters, weights in hanging:
                b.add_hanging_node(node, None, masters, weights)
            if pin_pressure:
                # positional choice (root-vertex order, see
                # pressure_pin_candidates) so every MG level pins the
                # same physical point under any node numbering
                for n in pressure_pin_candidates(space):
                    if not b.is_constrained(b.dof(int(n), dim)):
                        b.add_line(b.dof(int(n), dim))
                        break
                else:
                    for n in range(space.n_nodes):
                        if not b.is_constrained(b.dof(n, dim)):
                            b.add_line(b.dof(n, dim))
                            break
            return b

        self.full = build(False).close(dtype)
        self.homogeneous = build(True).close(dtype)

        # inhomogeneous: same rows as homogeneous, but remember which rows
        # belong to which (boundary fn, node, comp) for per-step updates
        self._inhom_builder = build(True)
        self._inhom_slots = []  # (fn, row_positions, nodes, comps)
        rows_sorted = np.asarray(self.homogeneous.rows)
        for bid, fn in bcs.all_inhomogeneous_dbcs:
            nodes = space.boundary_nodes([bid])
            for comp in self.vel_comps:
                dofs = nodes.astype(np.int64) * (dim + 1) + comp
                pos = np.searchsorted(rows_sorted, dofs)
                ok = (pos < len(rows_sorted)) & (rows_sorted[np.minimum(
                    pos, len(rows_sorted) - 1)] == dofs)
                self._inhom_slots.append((fn, pos[ok], nodes[ok], comp))

    def _match_periodic(self, b0, b1, direction):
        sp = self.space
        na = sp.boundary_nodes([b0])
        nb = sp.boundary_nodes([b1])
        key_dims = [d for d in range(sp.dim) if d != direction]
        tol = max(self.space.mesh.cell_min_vertex_distance().min() / 64, 1e-12)

        def keys(nodes):
            k = np.round(sp.node_pos[nodes][:, key_dims] / tol).astype(np.int64)
            return [tuple(row) for row in k]

        map_a = dict(zip(keys(na), na))
        pa, pb = [], []
        for k, nb_i in zip(keys(nb), nb):
            if k in map_a:
                pa.append(nb_i)   # constrain side b
                pb.append(map_a[k])
        return np.array(pa), np.array(pb)

    def inhomogeneous_at(self, t: float) -> ConstraintArrays:
        """Constraint set with boundary values evaluated at time t
        (``main.cc:925-942``)."""
        inhom = np.zeros(self.homogeneous.rows.shape[0])
        for fn, pos, nodes, comp in self._inhom_slots:
            fn.set_time(t)
            inhom[pos] = fn(self.space.node_pos[nodes], comp)
        return self.homogeneous._replace(
            inhom=jnp.asarray(inhom, self.dtype)
        )


class Driver:
    def __init__(self, params: Parameters):
        from ns_gls_tpu.utils.precision import ensure_tpu_matmul_precision

        ensure_tpu_matmul_precision()
        self.params = params
        self.log = get_logger()

    # ------------------------------------------------------------------
    def setup(self):
        p = self.params
        if p.precision == "f64":
            jax.config.update("jax_enable_x64", True)
        dtype = p.dtype
        mg_dtype = p.mg_dtype

        with timer("setup::simulation"):
            sim = make_simulation(p.simulation_name, p.dim)
            # each case re-parses shared keys, like the reference's
            # two-phase ParameterHandler parsing (``simulation.cc:233-289``)
            sim.parse_parameters(
                p.extra
                | {
                    "nu": p.nu,
                    "paraview prefix": p.paraview_prefix,
                    "output granularity": p.output_granularity,
                    "fe degree": p.fe_degree,
                    "mapping degree": p.mapping_degree,
                }
            )
            self.sim = sim
            mesh = sim.create_mesh(p.n_global_refinements)
            self.mesh = mesh

        bcs = sim.get_boundary_descriptor()
        self.bcs = bcs
        mapping_degree = sim.mapping_degree(p.fe_degree, p.mapping_degree)

        with timer("setup::space"):
            space = FESpace(mesh, p.fe_degree, mapping_degree)
            self.space = space
        self.log(
            f"    [I] Number of active cells:    {mesh.n_cells}\n"
            f"    [I] Global degrees of freedom: {space.n_nodes * (p.dim + 1)}"
        )

        with timer("setup::constraints"):
            self.csets = ConstraintSetBuilder(space, bcs, dtype)

        self.time_integrator = make_time_integrator(
            p.time_integration, p.bdf_order, p.theta
        )

        increment_form = p.nonlinear_solver == "Newton"
        nitsche = {
            bid: fn for bid, fn in bcs.all_outflow_bcs_nitsche.items()
        }

        # Jacobian-apply MXU precision (NS_JAC_PREC).  Measured r5,
        # 3D ref5 Q2 increment apply: "2x" (bf16x2 with bf16-rounded
        # band operands — a FIXED, exactly-linear perturbation J~ of
        # the Jacobian, ~2^-9 per band) runs 355 us vs 461 ("3x");
        # GMRES sees a nearby exact-linear operator, so no iteration
        # thrash — unlike per-entry bf16 rounding, whose ~4e-3
        # NONLINEAR matvec noise loses end to end (6.13 s/step vs
        # 2.54, ref-1 at the 2e-6 tolerance) despite a faster raw
        # apply (5359 MDoF/s).  The sweeps demote "2x" to exact-grade
        # "3x" for every flavor whose converged solution inherits
        # operator error (Picard/linearized fixed-point, residual,
        # rhs) — see ops/structured._mm_tools.  (GMG level smoothers
        # remain bf16 — they precondition only.)
        jac_prec = os.environ.get("NS_JAC_PREC", "2x")

        with timer("setup::operator"):
            self.op = NavierStokesOperator(
                space,
                self.csets.homogeneous,
                self.csets.full,
                nu=p.nu,
                c_1=p.c_1,
                c_2=p.c_2,
                time_integrator=self.time_integrator,
                consider_time_derivative=p.consider_time_derivative,
                increment_form=increment_form,
                cell_wise_stabilization=p.cell_wise_stabilization,
                outflow_bcs_cut=bcs.all_outflow_bcs_cut,
                outflow_bcs_nitsche=nitsche,
                dtype=dtype,
                structured_precision=jac_prec,
            )
            self.op.constraints_inhomogeneous = self.csets.inhomogeneous_at(0.0)

        if p.n_devices > 1:
            # domain decomposition: shard the fine-level cell batch over a
            # device mesh (SFC order + psum; SURVEY §2 parallelism table)
            from ns_gls_tpu.parallel.sharding import (
                ShardedOperator,
                make_device_mesh,
            )

            devices = jax.devices()[: p.n_devices]
            if len(devices) < p.n_devices:
                raise ValueError(
                    f"requested {p.n_devices} devices, have {len(jax.devices())}"
                )
            self.op_unsharded = self.op
            self.device_mesh = make_device_mesh(devices)
            strategy = p.parallel_strategy
            if strategy == "halo" and p.use_matrix_free_ns_operator:
                # node-sharded O(halo) ppermute exchange — the scalable
                # p4est-partition analogue (``operator_ns.cc:260,346``)
                from ns_gls_tpu.parallel.halo import HaloShardedOperator

                self.op = HaloShardedOperator(self.op, self.device_mesh)
            elif strategy in ("halo", "replicated"):
                self.op = ShardedOperator(self.op, self.device_mesh)
            else:
                raise ValueError(f"unknown parallel strategy {strategy}")

        if not p.use_matrix_free_ns_operator:
            # assembled-SpMV fallback (``main.cc:351-364``; reference
            # restricts it to non-Newton solvers)
            if p.nonlinear_solver == "Newton":
                raise ValueError(
                    "matrix-based operator does not support Newton"
                )
            from ns_gls_tpu.ops.matrix_based import (
                NavierStokesOperatorMatrixBased,
            )

            self.op = NavierStokesOperatorMatrixBased(self.op)

        # ---- preconditioner ------------------------------------------------
        self.mg_ops = []
        self.mg_transfers = []
        with timer("setup::preconditioner"):
            if p.preconditioner == "GMG-LS" and p.n_devices == 1:
                self._setup_gmg_ls(sim, bcs, mapping_degree,
                                   increment_form, mg_dtype)
            elif p.preconditioner in ("GMG", "GMG-LS"):
                if p.preconditioner == "GMG-LS":
                    # EXPLICIT config choice (not a silent substitution):
                    # the multi-device cycle is the distributed
                    # global-coarsening V-cycle; a user who needs the
                    # local-smoothing cycle itself must opt in to the
                    # fallback with "gmg ls parallel fallback": true.
                    # (Every reference benchmark config uses GC;
                    # ``multigrid.cc:247-593`` runs LS under MPI, which
                    # this framework covers with the GC cycle instead.)
                    if not p.gmg_ls_parallel_fallback:
                        raise ValueError(
                            "preconditioner 'GMG-LS' with 'n devices' > 1 "
                            "is served by the distributed global-"
                            "coarsening GMG cycle; set "
                            '"gmg ls parallel fallback": true to accept '
                            "it (or use preconditioner 'GMG')"
                        )
                    import warnings

                    warnings.warn(
                        "preconditioner 'GMG-LS' with 'n devices' > 1 "
                        "falls back to the global-coarsening GMG cycle "
                        "(the reference equally restricts GMG-LS to its "
                        "non-benchmark single-rank configs)",
                        stacklevel=2,
                    )
                self._setup_gmg(sim, bcs, mapping_degree, increment_form,
                                mg_dtype)
            elif p.preconditioner == "ILU":
                from ns_gls_tpu.precond.ilu import PreconditionerILU

                self.preconditioner = PreconditionerILU(
                    getattr(self, "op_unsharded", self.op)
                )
            elif p.preconditioner == "AMG":
                from ns_gls_tpu.precond.amg import PreconditionerAMG

                self.preconditioner = PreconditionerAMG(
                    getattr(self, "op_unsharded", self.op),
                    matrix_free_fine=True,
                    smoother=p.amg_smoother,
                )
            elif p.preconditioner == "Jacobi":
                self.preconditioner = PreconditionerJacobi(
                    getattr(self, "op_unsharded", self.op)
                )
            elif p.preconditioner == "identity":
                self.preconditioner = PreconditionerIdentity()
            else:
                raise ValueError(f"unknown preconditioner {p.preconditioner}")

        # ---- linear solver -------------------------------------------------
        if p.linear_solver == "GMRES":
            self.linear_solver = LinearSolverGMRES(
                self.op, self.preconditioner,
                p.lin_n_max_iterations, p.lin_absolute_tolerance,
                p.lin_relative_tolerance, logger=self.log,
            )
        elif p.linear_solver == "direct":
            self.linear_solver = LinearSolverDirect(self.op, logger=self.log)
        elif p.linear_solver == "Richardson":
            self.linear_solver = LinearSolverRichardson(
                self.op, self.preconditioner,
                p.lin_n_max_iterations, p.lin_absolute_tolerance,
                p.lin_relative_tolerance, logger=self.log,
            )
        else:
            raise ValueError(f"unknown linear solver {p.linear_solver}")

        # ---- nonlinear solver ----------------------------------------------
        nl = make_nonlinear_solver(p.nonlinear_solver, p.newton_inexact,
                                   p.nonlinear_tolerance,
                                   p.nonlinear_tolerance_relative,
                                   p.nonlinear_max_iterations)
        nl.logger = self.log
        nl.setup_jacobian = self._setup_jacobian
        nl.setup_preconditioner = self._setup_preconditioner
        nl.evaluate_rhs = lambda: self.op.evaluate_rhs()
        nl.evaluate_residual = lambda u: self.op.evaluate_residual(u)
        nl.solve_with_jacobian = self._solve_with_jacobian
        if p.n_devices == 1 and hasattr(self.op, "residual_pure"):
            # fused Newton advance (single-device)
            nl.advance_and_residual = self._advance_and_residual
            if not self.op.outflow_bcs_nitsche:
                # the fused entry skips the (host-cached) Nitsche
                # face-target hook, so keep the classic entry there
                nl.prepare_residual = (
                    lambda u: self._advance_and_residual(
                        u, jnp.zeros_like(u)
                    )[1:]
                )
        elif hasattr(self.op, "_localize_state"):
            # fused Newton advance on the halo-sharded path (same
            # dispatch discipline: one device call per Newton iteration)
            nl.advance_and_residual = self._advance_and_residual_sharded
            if not self.op.outflow_bcs_nitsche:
                nl.prepare_residual = (
                    lambda u: self._advance_and_residual_sharded(
                        u, jnp.zeros_like(u)
                    )[1:]
                )
        self.nonlinear_solver = nl

        # ---- state ----------------------------------------------------------
        self.solution = SolutionHistory.zeros(
            self.time_integrator.order + 1,
            (space.n_nodes, p.dim + 1),
            dtype,
        )
        self.solution.current = distribute(
            self.op.constraints_inhomogeneous, self.solution.current
        )
        sim.setup_postprocess(space, p.nu)

    # ------------------------------------------------------------------
    def _setup_gmg(self, sim, bcs, mapping_degree, increment_form, mg_dtype):
        """Geometric coarsening sequence (``main.cc:396-568``): the level
        meshes are the refinement *generation chain* of the final mesh
        (each level is literally the ``refine()`` of the previous one, so
        MG transfers come straight from the stored parent maps — also
        correct for adaptively refined hierarchies)."""
        p = self.params
        meshes = [self.mesh]
        while meshes[0].prev is not None:
            meshes.insert(0, meshes[0].prev)
        self.mg_spaces = []
        self.mg_csets = []
        self.mg_ops = []
        for lvl, mesh_l in enumerate(meshes):
            # "gmg coarse grid use fe q iso q1" (``main.cc:396-568``,
            # FE_Q_iso_Q1): coarsest-level operator on piecewise-Q1 shape
            # functions over the same node lattice -> Q1-sparse coarse
            # matrix for the AMG/LU coarse solve, identical DoFs so the
            # transfers and constraints are unchanged.
            iso = p.mg_use_fe_q_iso_q1 and lvl == 0 and mesh_l is not self.mesh
            space_l = (
                self.space if mesh_l is self.mesh
                else FESpace(mesh_l, p.fe_degree, mapping_degree, iso_q1=iso)
            )
            self.mg_spaces.append(space_l)
            cs = ConstraintSetBuilder(space_l, bcs, mg_dtype)
            # level operators use all-homogeneous constraints
            # (``main.cc:509-529``: same set for all three slots)
            ca = cs.homogeneous
            if p.gmg_constraint_coarse_pressure_dof and lvl == 0:
                ca = self._pin_coarse_pressure(space_l, ca)
            self.mg_csets.append(ca)
            op_l = NavierStokesOperator(
                space_l, ca, ca,
                nu=p.nu, c_1=p.c_1, c_2=p.c_2,
                time_integrator=self.time_integrator,
                consider_time_derivative=p.consider_time_derivative,
                increment_form=increment_form,
                cell_wise_stabilization=p.cell_wise_stabilization,
                outflow_bcs_cut=bcs.all_outflow_bcs_cut,
                outflow_bcs_nitsche=dict(bcs.all_outflow_bcs_nitsche),
                dtype=mg_dtype,
                # level operators only ever run as smoother components of
                # the V-cycle: one bf16 MXU pass is plenty there (the
                # outer Krylov/residual operator keeps f32-grade 3x)
                structured_precision="bf16",
            )
            op_l.constraints_inhomogeneous = ca
            self.mg_ops.append(op_l)

        self.mg_transfers = [
            build_transfer(self.mg_spaces[l], self.mg_spaces[l + 1], mg_dtype)
            for l in range(len(meshes) - 1)
        ]
        mg_ops_apply = None
        mg_transfer_ops = None
        if p.n_devices > 1:
            # shard every level's hot apply over the same device mesh as
            # the fine operator: the V-cycle's smoother vmults (the
            # dominant cost, SURVEY §3.4) then scale with the chips, not
            # just the fine-level GMRES matvec
            if (p.parallel_strategy == "halo"
                    and p.use_matrix_free_ns_operator):
                # fully distributed V-cycle: node-sharded level operators
                # + O(interface) halo transfers; only the coarse solve
                # gathers to the replicated layout (``main.cc:540-567``
                # on partitioned vectors)
                from ns_gls_tpu.parallel.halo import (
                    HaloShardedOperator,
                    HaloTransferOps,
                )

                mg_ops_apply = [
                    HaloShardedOperator(op_l, self.device_mesh)
                    for op_l in self.mg_ops
                ]
                mg_transfer_ops = [
                    HaloTransferOps(
                        self.mg_transfers[l], mg_ops_apply[l],
                        mg_ops_apply[l + 1],
                    )
                    for l in range(len(self.mg_ops) - 1)
                ]
                # the outer Krylov hands the V-cycle vectors in the fine
                # operator's distributed layout — the finest level op
                # must partition identically (same mesh, same SFC order)
                import numpy as _np

                assert _np.array_equal(
                    _np.asarray(mg_ops_apply[-1]._own_global),
                    _np.asarray(self.op._own_global),
                ), "fine MG level layout differs from the operator's"
            else:
                from ns_gls_tpu.parallel.sharding import ShardedOperator

                mg_ops_apply = [
                    ShardedOperator(op_l, self.device_mesh)
                    for op_l in self.mg_ops
                ]
        self.preconditioner = PreconditionerGMG(
            self.mg_ops,
            self.mg_transfers,
            level_ops_apply=mg_ops_apply,
            transfer_ops=mg_transfer_ops,
            fine_dtype=p.dtype,
            mg_dtype=mg_dtype,
            smoothing_n_iterations=p.gmg.smoothing_n_iterations,
            smoothing_range=p.gmg.smoothing_range,
            smoothing_eig_n_iterations=p.gmg.smoothing_eig_cg_n_iterations,
            coarse_grid_solver=p.gmg.coarse_grid_solver,
            coarse_grid_iterate=p.gmg.coarse_grid_iterate,
            coarse_grid_gmres_reltol=p.gmg.coarse_grid_gmres_reltol,
            coarse_amg_default_parameters=(
                p.gmg.coarse_grid_amg_default_parameters
            ),
            compute_evs_n_levels=p.gmg.compute_evs_n_levels,
            logger=self.log
            if (p.gmg.output_details or p.gmg.compute_evs_n_levels > 0)
            else None,
        )

    def _setup_gmg_ls(self, sim, bcs, mapping_degree, increment_form,
                      mg_dtype):
        """Local-smoothing multigrid (``main.cc:569-732``): levels are
        the cells of each refinement level of the forest, smoothing is
        masked off the refinement edge, the coarse level is the full
        initial mesh.  See ``precond/gmg_ls.py`` for the cycle."""
        import numpy as np

        from ns_gls_tpu.mesh.forest import forest_levels
        from ns_gls_tpu.precond.gmg_ls import PreconditionerGMGLS

        p = self.params
        levels = forest_levels(self.mesh)
        n_fin = self.space.n_nodes
        self.mg_spaces = []
        self.mg_ops = []
        lvl2fin = []       # per level: (level_nodes, fin_nodes) full map
        for lvl, L in enumerate(levels):
            space_l = FESpace(L.mesh, p.fe_degree, mapping_degree)
            self.mg_spaces.append(space_l)
            cs = ConstraintSetBuilder(space_l, bcs, mg_dtype)
            ca = cs.homogeneous
            if p.gmg_constraint_coarse_pressure_dof and lvl == 0:
                ca = self._pin_coarse_pressure(space_l, ca)
            op_l = NavierStokesOperator(
                space_l, ca, ca,
                nu=p.nu, c_1=p.c_1, c_2=p.c_2,
                time_integrator=self.time_integrator,
                consider_time_derivative=p.consider_time_derivative,
                increment_form=increment_form,
                cell_wise_stabilization=p.cell_wise_stabilization,
                outflow_bcs_cut=bcs.all_outflow_bcs_cut,
                outflow_bcs_nitsche=dict(bcs.all_outflow_bcs_nitsche),
                dtype=mg_dtype,
                structured_precision="bf16",
            )
            op_l.constraints_inhomogeneous = ca
            self.mg_ops.append(op_l)

            act = np.nonzero(L.active >= 0)[0]
            ln = np.asarray(space_l.cell_nodes)[act].reshape(-1)
            fn = np.asarray(self.space.cell_nodes)[L.active[act]].reshape(-1)
            pairs = np.unique(np.stack([ln, fn], axis=1), axis=0)
            assert len(np.unique(pairs[:, 0])) == len(pairs), \
                "inconsistent level-to-global node identification"
            lvl2fin.append((pairs[:, 0], pairs[:, 1]))

        self.mg_transfers = [
            build_transfer(self.mg_spaces[l], self.mg_spaces[l + 1],
                           mg_dtype)
            for l in range(len(levels) - 1)
        ]

        # coarsest active level of every final node (edge dofs belong to
        # the coarse side; defect injection happens there)
        node_min_level = np.full(n_fin, len(levels), np.int64)
        for lvl, (ln, fn) in enumerate(lvl2fin):
            np.minimum.at(node_min_level, fn, lvl)

        # refinement-edge masks: faces of the level mesh with a single
        # cell that are not on the domain boundary border coarser active
        # cells (2:1 balance); their nodes are excluded from smoothing
        inj_maps, copy_maps, int_masks = [], [], []
        for lvl, L in enumerate(levels):
            space_l = self.mg_spaces[lvl]
            mask = np.ones((space_l.n_nodes, 1), np.float64)
            if lvl > 0:
                bf = L.mesh.compute_boundary_faces()
                iface = bf[L.mesh.boundary_ids[bf[:, 0], bf[:, 1]] < 0]
                cn = np.asarray(space_l.cell_nodes)
                for lf in np.unique(iface[:, 1]):
                    cells = iface[iface[:, 1] == lf, 0]
                    loc = space_l.face_node_lattice(int(lf))
                    mask[cn[cells][:, loc].reshape(-1)] = 0.0
            int_masks.append(mask)
            ln, fn = lvl2fin[lvl]
            res = node_min_level[fn] == lvl
            inj_maps.append((ln[res], fn[res]))
            copy_maps.append((ln, fn))

        self._ls_lvl2fin = lvl2fin
        self.preconditioner = PreconditionerGMGLS(
            self.mg_ops,
            self.mg_transfers,
            inj_maps,
            copy_maps,
            int_masks,
            constrained_rows=np.asarray(self.csets.homogeneous.rows),
            n_fine_nodes=n_fin,
            fine_dtype=p.dtype,
            mg_dtype=mg_dtype,
            smoothing_n_iterations=p.gmg.smoothing_n_iterations,
            smoothing_range=p.gmg.smoothing_range,
            smoothing_eig_n_iterations=p.gmg.smoothing_eig_cg_n_iterations,
            coarse_grid_solver=p.gmg.coarse_grid_solver,
            logger=self.log
            if (p.gmg.output_details or p.gmg.compute_evs_n_levels > 0)
            else None,
        )

    def _pin_coarse_pressure(self, space_l, ca: ConstraintArrays):
        """Constrain one pressure dof on the level (``main.cc:453-477``),
        chosen positionally (root-vertex order, see
        pressure_pin_candidates) so every level — and the fine system's
        pin in ConstraintSetBuilder — gauges the constant-pressure mode
        at the same physical point under any node numbering."""
        dim = space_l.dim
        rows = set(np.asarray(ca.rows).tolist())
        cand = [int(n) * (dim + 1) + dim
                for n in pressure_pin_candidates(space_l)]
        if not cand:
            cand = [dim]             # node 0's pressure dof (fallback)
        if any(d in rows for d in cand):
            return ca                # already gauged at a canonical point
        dof = cand[0]
        b = AffineConstraints(space_l.n_nodes, dim + 1)
        b.add_line(dof)
        extra = b.close(ca.weights.dtype)
        import jax.numpy as jnp

        pad = ca.cols.shape[1]
        return ConstraintArrays(
            rows=jnp.concatenate([ca.rows, extra.rows]),
            cols=jnp.concatenate(
                [ca.cols, jnp.zeros((1, pad), ca.cols.dtype)]
            ),
            weights=jnp.concatenate(
                [ca.weights, jnp.zeros((1, pad), ca.weights.dtype)]
            ),
            inhom=jnp.concatenate([ca.inhom, extra.inhom]),
        )

    # ------------------------------------------------------------------
    # nonlinear solver callbacks (``main.cc:805-869``)
    # ------------------------------------------------------------------
    def _interpolate_to_levels(self, u_fine):
        """Fine -> all levels via chained solution interpolation
        (``interpolate_to_mg``, ``main.cc:789-795``).  In the GMG-LS
        flavor the level meshes only partially overlap the final mesh:
        the active region copies the global values directly and the
        ancestor region gets the interpolation from the finer level."""
        ls_maps = getattr(self, "_ls_lvl2fin", None)
        out = [None] * len(self.mg_ops)
        cur = u_fine.astype(self.params.mg_dtype)
        if ls_maps is None:
            out[-1] = cur
            for l in range(len(self.mg_ops) - 2, -1, -1):
                cur = interpolate_to_coarse(self.mg_transfers[l], cur)
                out[l] = cur
            return out
        import jax.numpy as jnp

        for l in range(len(self.mg_ops) - 1, -1, -1):
            w = (
                interpolate_to_coarse(self.mg_transfers[l], out[l + 1])
                if l < len(self.mg_ops) - 1
                else jnp.zeros(
                    (self.mg_spaces[l].n_nodes, self.params.dim + 1),
                    self.params.mg_dtype,
                )
            )
            ln, fn = ls_maps[l]
            w = w.at[jnp.asarray(ln)].set(cur[jnp.asarray(fn)])
            out[l] = w
        return out

    def _setup_jacobian(self, u):
        with timer("setup_jacobian"):
            self.op.set_linearization_point(u)

    def _advance_and_residual(self, u, inc):
        """Fused Newton advance: u + inc, re-linearize, residual and its
        norm in ONE device dispatch (the classic callback sequence pays
        four round trips per Newton iteration on the tunneled TPU).
        Nitsche face targets are host-cached by the step's first
        (classic) setup_jacobian, so the fused path skips that hook."""
        with timer("setup_jacobian"):
            fn = getattr(self, "_adv_res_fn", None)
            if fn is None:
                op = self.op

                def impl(batch, faces, state, ca_inhom, u, inc, weight,
                         stau):
                    u2 = u + inc
                    st2 = op._set_linearization_impl(
                        batch, faces,
                        state._replace(weight=weight, stau=stau), u2,
                    )
                    rhs = op.residual_pure((batch, faces, st2), ca_inhom,
                                           u2)
                    from ns_gls_tpu.solvers.linear import acc_norm

                    return u2, st2, rhs, acc_norm(rhs)

                fn = jax.jit(impl)
                self._adv_res_fn = fn
            op = self.op
            tau = self.time_integrator.current_dt
            u2, st2, rhs, l2 = fn(
                op.batch, op.face_blocks, op.state,
                op.constraints_inhomogeneous, u, inc,
                jnp.asarray(self.time_integrator.primary_weight, op.dtype),
                jnp.asarray(0.0 if tau == 0.0 else 1.0 / tau, op.dtype),
            )
            op.state = st2
            op._valid_system = False
        return u2, rhs, l2

    def _advance_and_residual_sharded(self, u, inc):
        """Fused Newton advance on the halo-sharded path: u + inc,
        re-linearize the wrapped operator, localize the new state into
        the per-device windows, sharded residual sweep + norm — ONE
        device dispatch, mirroring the single-device
        ``_advance_and_residual`` (the classic callback sequence pays
        ~8 dispatches per Newton iteration here: set-linearization,
        localize, to_dist, sweep, to_global, norm, ...)."""
        with timer("setup_jacobian"):
            fn = getattr(self, "_adv_res_sh_fn", None)
            hop = self.op                    # HaloShardedOperator
            iop = hop.op                     # wrapped NavierStokesOperator
            if fn is None:
                hop.vmult_args               # builds hop._localize_state

                def impl(ibatch, ifaces, istate, tmpl, u, inc, weight,
                         stau):
                    u2 = u + inc
                    st2 = iop._set_linearization_impl(
                        ibatch, ifaces,
                        istate._replace(weight=weight, stau=stau), u2,
                    )
                    largs = tmpl._replace(state=hop._localize_state(st2))
                    rhs = hop.to_global(
                        hop.residual_pure(largs, hop.to_dist(u2))
                    )
                    from ns_gls_tpu.solvers.linear import acc_norm

                    return u2, st2, largs, rhs, acc_norm(rhs)

                fn = jax.jit(impl)
                self._adv_res_sh_fn = fn
            # localized-args template: every non-state component of the
            # HaloArgs pytree, passed as jit ARGUMENTS (not closure
            # constants) so constraint updates flow without recompiles
            tmpl = hop.vmult_args
            tau = self.time_integrator.current_dt
            u2, st2, largs, rhs, l2 = fn(
                iop.batch, iop.face_blocks, iop.state, tmpl, u, inc,
                jnp.asarray(self.time_integrator.primary_weight,
                            iop.dtype),
                jnp.asarray(0.0 if tau == 0.0 else 1.0 / tau, iop.dtype),
            )
            iop.state = st2
            iop._valid_system = False
            hop._args_cache = largs          # Jacobian solve reads these
            hop._args_state_src = st2        # keep the identity check valid
        return u2, rhs, l2

    def _sharded_level_hops(self):
        """The preconditioner's per-level HaloShardedOperator wrappers
        when the fully distributed V-cycle is active (None otherwise) —
        their localized-args caches are refreshed inside the fused
        per-level update chains so the sharded path keeps the same
        dispatch discipline as the single-device one."""
        pre = getattr(self, "preconditioner", None)
        hops = getattr(pre, "level_ops_apply", None)
        if hops and all(hasattr(h, "_localize_fn")
                        or hasattr(h, "_local_state") for h in hops):
            return hops
        return None

    def _can_fuse_levels(self) -> bool:
        """The fused per-level update chains cover the production
        configurations (single device OR the halo-sharded V-cycle, no
        Nitsche targets on level ops); anything else takes the
        per-level calls."""
        if any(op.outflow_bcs_nitsche for op in self.mg_ops):
            return False
        return (
            self.params.n_devices == 1
            or self._sharded_level_hops() is not None
        )

    def _ls_idx(self):
        """Device copies of the GMG-LS (level-active, fine) index pairs
        (None for global coarsening)."""
        ls = getattr(self, "_ls_lvl2fin", None)
        if ls is None:
            return None
        idx = getattr(self, "_ls_idx_dev", None)
        if idx is None:
            idx = tuple(
                (jnp.asarray(np.asarray(ln)), jnp.asarray(np.asarray(fn)))
                for ln, fn in ls
            )
            self._ls_idx_dev = idx
        return idx

    def _level_chain(self, transfers, ls_idx, v):
        """Trace-time interpolation cascade fine -> all levels; in the
        GMG-LS flavor the active region copies fine values directly
        (a linear selection, so the cascade stays linear)."""
        n_l = len(self.mg_ops)
        out = [None] * n_l
        if ls_idx is None:
            out[-1] = v
            for l in range(n_l - 2, -1, -1):
                out[l] = interpolate_to_coarse(transfers[l], out[l + 1])
            return out
        for l in range(n_l - 1, -1, -1):
            w = (
                interpolate_to_coarse(transfers[l], out[l + 1])
                if l < n_l - 1
                else jnp.zeros(
                    (self.mg_spaces[l].n_nodes, self.params.dim + 1),
                    v.dtype,
                )
            )
            ln, fn = ls_idx[l]
            out[l] = w.at[ln].set(v[fn])
        return out

    def _fused_level_linearization(self, u):
        """Interpolation chain + every level's set_linearization_point in
        ONE jitted dispatch (the per-level calls cost ~2 device round
        trips per level per Newton step on the tunneled TPU).  On the
        halo-sharded path the same dispatch also re-localizes every
        level wrapper's args pytree (the lazy per-level rebuilds were
        ~2 x n_levels extra launches per Newton step)."""
        fn = getattr(self, "_lvl_lin_fn", None)
        hops = self._sharded_level_hops()
        if hops is not None:
            for h in hops:
                h.vmult_args            # build h._localize_fn once
        if fn is None:
            ops = tuple(self.mg_ops)
            mgdt = self.params.mg_dtype
            loc = (tuple(h._localize_fn for h in hops)
                   if hops is not None else None)

            def impl(transfers, batches, faces, states, tmpls, u, weight,
                     stau, ls_idx):
                levels = self._level_chain(transfers, ls_idx,
                                           u.astype(mgdt))
                out = []
                largs = []
                for l in range(len(ops)):
                    st = states[l]._replace(weight=weight, stau=stau)
                    st2 = ops[l]._set_linearization_impl(
                        batches[l], faces[l], st, levels[l]
                    )
                    out.append(st2)
                    if loc is not None:
                        largs.append(tmpls[l]._replace(state=loc[l](st2)))
                return tuple(out), tuple(largs)

            fn = jax.jit(impl)
            self._lvl_lin_fn = fn
        tau = self.time_integrator.current_dt
        mgdt = self.params.mg_dtype
        new_states, new_largs = fn(
            tuple(self.mg_transfers),
            tuple(op.batch for op in self.mg_ops),
            tuple(op.face_blocks for op in self.mg_ops),
            tuple(op.state for op in self.mg_ops),
            tuple(h.vmult_args for h in hops) if hops is not None else (),
            u,
            jnp.asarray(self.time_integrator.primary_weight, mgdt),
            jnp.asarray(0.0 if tau == 0.0 else 1.0 / tau, mgdt),
            self._ls_idx(),
        )
        for l, (op_l, st) in enumerate(zip(self.mg_ops, new_states)):
            op_l._valid_system = False
            op_l.state = st
            if hops is not None:
                hops[l]._args_cache = new_largs[l]
                hops[l]._args_state_src = st

    def _setup_preconditioner(self, u):
        with timer("setup_preconditioner"):
            if self.mg_ops and self._can_fuse_levels():
                self._fused_level_linearization(u)
            elif self.mg_ops:
                levels = self._interpolate_to_levels(u)
                for op_l, u_l in zip(self.mg_ops, levels):
                    op_l.set_linearization_point(u_l)
            gran = self.params.preconditioner_update_granularity
            if gran == "newton":
                rebuild = True
            else:
                # "step" or "step:N": rebuild on the first Newton
                # iteration of every Nth time step
                every = int(gran.split(":")[1]) if ":" in gran else 1
                stale = getattr(self, "_precond_stale", True)
                count = getattr(self, "_precond_step_count", 0)
                if stale:
                    self._precond_step_count = count = count + 1
                    self._precond_stale = False
                rebuild = stale and (
                    count % every == 1 or every == 1 or count == 1
                )
            if hasattr(self.preconditioner, "initialize") and rebuild:
                self.preconditioner.initialize()
            self.linear_solver.initialize()

    def _solve_with_jacobian(self, rhs):
        from ns_gls_tpu.fem import constraints as cstr
        from ns_gls_tpu.solvers.linear import LinearSolverGMRES

        with timer("solve_with_jacobian"):
            ls = self.linear_solver
            if (isinstance(ls, LinearSolverGMRES)
                    and not hasattr(ls.op, "to_dist")):
                # fused: constraint zeroing, tolerance, the GMRES solve
                # and the constraint distribution in ONE dispatch (the
                # sequence was four device round trips per Newton
                # iteration over the tunnel)
                fn = getattr(self, "_solve_fn", None)
                if fn is None:
                    from ns_gls_tpu.solvers.linear import acc_norm, gmres

                    op, pre = ls.op, ls.preconditioner
                    restart = ls.restart
                    max_restarts = max(1, ls.n_max_iterations // restart)

                    def impl(a_args, m_args, ca, b, rel, ab):
                        b0 = cstr.set_zero(ca, b)
                        tol = jnp.maximum(rel * acc_norm(b0), ab)
                        res = gmres(
                            op.vmult_pure, a_args, b0,
                            jnp.zeros_like(b0), M=pre.vmult_pure,
                            m_args=m_args, tol=tol, restart=restart,
                            max_restarts=max_restarts,
                        )
                        return (
                            cstr.distribute(ca, res.x, homogeneous=True),
                            res.iterations,
                        )

                    fn = jax.jit(impl)
                    self._solve_fn = fn
                dst, its = fn(
                    ls.op.vmult_args, ls.preconditioner.vmult_args,
                    self.csets.homogeneous, rhs,
                    jnp.asarray(ls.rel_tol, rhs.dtype),
                    jnp.asarray(ls.abs_tol, rhs.dtype),
                )
                ls._last_it = int(its)
                if ls.logger:
                    ls.logger(f"    [L] solved in {ls._last_it} iterations.")
                return dst
            if isinstance(ls, LinearSolverGMRES) and hasattr(ls.op,
                                                             "to_dist"):
                # fused halo-sharded Jacobian solve: constraint zeroing,
                # tolerance, the global->distributed scatter, the Krylov
                # loop (distributed layout end to end), the gather and
                # the constraint distribution in ONE dispatch — the
                # unfused sequence was ~6 launches per Newton iteration
                fn = getattr(self, "_solve_sh_fn", None)
                if fn is None:
                    from ns_gls_tpu.solvers.linear import acc_norm, gmres

                    op, pre = ls.op, ls.preconditioner
                    restart = ls.restart
                    max_restarts = max(1, ls.n_max_iterations // restart)
                    if getattr(pre, "distributed", False):
                        M = pre.vmult_pure
                    else:
                        def M(margs, x):
                            return op.to_dist(
                                pre.vmult_pure(margs, op.to_global(x))
                            )

                    def impl(a_args, m_args, ca, b, rel, ab):
                        b0 = cstr.set_zero(ca, b)
                        tol = jnp.maximum(rel * acc_norm(b0), ab)
                        bd = op.to_dist(b0)
                        res = gmres(
                            op.vmult_pure, a_args, bd,
                            jnp.zeros_like(bd), M=M, m_args=m_args,
                            tol=tol, restart=restart,
                            max_restarts=max_restarts,
                        )
                        x = op.to_global(res.x)
                        return (
                            cstr.distribute(ca, x, homogeneous=True),
                            res.iterations,
                        )

                    fn = jax.jit(impl)
                    self._solve_sh_fn = fn
                dst, its = fn(
                    ls.op.vmult_args, ls.preconditioner.vmult_args,
                    self.csets.homogeneous, rhs,
                    jnp.asarray(ls.rel_tol, rhs.dtype),
                    jnp.asarray(ls.abs_tol, rhs.dtype),
                )
                ls._last_it = int(its)
                if ls.logger:
                    ls.logger(f"    [L] solved in {ls._last_it} iterations.")
                return dst
            rhs = cstr.set_zero(self.csets.homogeneous, rhs)
            dst = ls.solve(rhs)
            return cstr.distribute(self.csets.homogeneous, dst,
                                   homogeneous=True)

    def _fused_level_history(self):
        """Level history push in ONE jitted dispatch: interpolation is
        linear, so the levels' weighted old sums are the chained
        interpolations of the fine weighted sum (one chain instead of
        one per history vector), plus a u_old chain for theta tables."""
        fn = getattr(self, "_lvl_hist_fn", None)
        hops = self._sharded_level_hops()
        if hops is not None:
            for h in hops:
                h.vmult_args            # build h._localize_fn once
        if fn is None:
            ops = tuple(self.mg_ops)
            mgdt = self.params.mg_dtype
            loc = (tuple(h._localize_fn for h in hops)
                   if hops is not None else None)

            def impl(transfers, batches, states, tmpls, vec_old_f, u_old_f,
                     weight, stau, ls_idx):
                n_l = len(ops)

                def chain(v):
                    return self._level_chain(transfers, ls_idx,
                                             v.astype(mgdt))

                vo = chain(vec_old_f)
                uo = (chain(u_old_f) if ops[0].theta != 1.0
                      else [None] * n_l)
                outs = []
                largs = []
                # the BDF weights are O(1/dt): history tables trace at
                # HIGHEST matmul precision like the fine op's set_prev
                with jax.default_matmul_precision("highest"):
                    for l in range(n_l):
                        st = states[l]._replace(weight=weight, stau=stau)
                        st2 = ops[l]._set_previous_impl(
                            batches[l], st, vo[l],
                            uo[l] if uo[l] is not None else vo[l],
                        )
                        outs.append(st2)
                        if loc is not None:
                            largs.append(
                                tmpls[l]._replace(state=loc[l](st2))
                            )
                return tuple(outs), tuple(largs)

            fn = jax.jit(impl)
            self._lvl_hist_fn = fn
        w = self.time_integrator.weights
        vec_old_f = self.solution.weighted_old_sum(
            tuple(jnp.asarray(x, self.op.dtype) for x in w)
        )
        tau = self.time_integrator.current_dt
        mgdt = self.params.mg_dtype
        new_states, new_largs = fn(
            tuple(self.mg_transfers),
            tuple(op.batch for op in self.mg_ops),
            tuple(op.state for op in self.mg_ops),
            tuple(h.vmult_args for h in hops) if hops is not None else (),
            vec_old_f,
            self.solution.vectors[1],
            jnp.asarray(self.time_integrator.primary_weight, mgdt),
            jnp.asarray(0.0 if tau == 0.0 else 1.0 / tau, mgdt),
            self._ls_idx(),
        )
        for l, (op_l, st) in enumerate(zip(self.mg_ops, new_states)):
            op_l._valid_system = False
            op_l.state = st
            if hops is not None:
                hops[l]._args_cache = new_largs[l]
                hops[l]._args_state_src = st

    def _set_previous_solution(self):
        """(``main.cc:772-803``)"""
        self.op.set_previous_solution(self.solution)
        if self.mg_ops and self.time_integrator.order > 0:
            if self._can_fuse_levels():
                self._fused_level_history()
                return
            n_l = len(self.mg_ops)
            hist_l = [
                SolutionHistory.zeros(
                    self.time_integrator.order + 1,
                    (self.mg_spaces[l].n_nodes, self.params.dim + 1),
                    self.params.mg_dtype,
                )
                for l in range(n_l)
            ]
            for i in range(1, self.time_integrator.order + 1):
                levels = self._interpolate_to_levels(self.solution.vectors[i])
                for l in range(n_l):
                    hist_l[l].vectors[i] = levels[l]
            for l in range(n_l):
                self.mg_ops[l].set_previous_solution(hist_l[l])

    # ------------------------------------------------------------------
    def run(self, max_steps: int = 10**9, resume: bool = False):
        p = self.params
        if not getattr(self, "_setup_done", False):
            self.setup()
            self._setup_done = True
        t = 0.0
        counter = 1
        min_dx = self.mesh.minimal_cell_diameter()
        records = []

        if resume:
            # restart from the last checkpoint (new capability, SURVEY
            # §5.4: the reference always restarts from t=0)
            from ns_gls_tpu.utils.checkpoint import load_checkpoint

            if not p.checkpoint_prefix:
                raise ValueError("resume requested but no 'checkpoint prefix'")
            t, counter = load_checkpoint(p.checkpoint_prefix, self)
            if p.output_granularity > 0:
                self._output_counter = int(t / p.output_granularity) + 1
            self._checkpoint_counter = (
                int(t / p.checkpoint_granularity) + 1
                if p.checkpoint_granularity > 0
                else 0
            )
            self.log(f"    [C] resumed from t = {t:.6g} (cycle {counter})")
        else:
            self._output(t)
            rec = self.sim.postprocess(t, self.solution.current)
            if rec:
                records.append(rec)

        while t < p.t_final and counter <= max_steps:
            with timer("loop"):
                u_max = self.op.get_max_u(self.solution.current)
                dt = (
                    p.dt
                    if p.dt != 0.0
                    else min_dx * p.cfl / max(u_max, self.sim.get_u_max())
                )
                self.log(
                    f"\ncycle\t{counter} at time t = {t:.6g} with delta_t ="
                    f" {dt:.6g} and u_max = {u_max:.6g}"
                )

                # time-dependent inhomogeneous DBCs at (old) time t
                self.op.constraints_inhomogeneous = (
                    self.csets.inhomogeneous_at(t)
                )
                self.time_integrator.update_dt(dt)
                self.op.invalidate_system()
                for op_l in self.mg_ops:
                    op_l.invalidate_system()
                    op_l.update_weight()
                self.op.update_weight()

                self.solution.commit()
                self._set_previous_solution()
                self._precond_stale = True  # per-step precond granularity

                new_u = self.nonlinear_solver.solve(self.solution.current)

                new_u = distribute(self.op.constraints_inhomogeneous, new_u)
                new_u = distribute(self.csets.full, new_u)
                self.solution.current = new_u

                norm = float(jnp.linalg.norm(new_u.reshape(-1)))
                self.log(f"    [S] l2-norm of solution: {norm:.8g}")

                t += dt
                self._output(t)
                rec = self.sim.postprocess(t, self.solution.current)
                if rec:
                    records.append(rec)
                counter += 1
                self._checkpoint(t, counter)

                if self.time_integrator.order == 0:
                    break

        return records

    # ------------------------------------------------------------------
    _checkpoint_counter = 1

    def _checkpoint(self, t, counter, force=False):
        """Honor 'checkpoint prefix' / 'checkpoint granularity' (SURVEY
        §5.4 — new vs the reference): rolling save of the solution history
        + integrator state, restorable via ``run(resume=True)``."""
        p = self.params
        if not p.checkpoint_prefix:
            return
        if p.checkpoint_granularity > 0 and not force:
            if (t + 1e-15) < self._checkpoint_counter * p.checkpoint_granularity:
                return
        elif not force:
            return  # prefix set but granularity 0: checkpoint only on demand
        from ns_gls_tpu.utils.checkpoint import save_checkpoint

        with timer("postprocess::checkpoint"):
            save_checkpoint(p.checkpoint_prefix, self, t=t, counter=counter)
        self.log(f"    [C] checkpoint saved (t = {t:.6g})")
        self._checkpoint_counter += 1

    # ------------------------------------------------------------------
    _output_counter = 0

    def _output(self, t, force=False):
        p = self.params
        if p.output_granularity <= 0 and not force:
            return
        if (not force) and (t + 1e-15) < self._output_counter * p.output_granularity:
            return
        from ns_gls_tpu.utils.vtu import write_vtu

        fname = f"{p.paraview_prefix}.{self._output_counter}.vtu"
        with timer("postprocess::vtu"):
            write_vtu(fname, self.space, np.asarray(self.solution.current))
        self.log(f"    [O] output VTU ({fname})")
        self._output_counter += 1
