"""Patch-lattice 2D Pallas fast path (ops/patch2d.py) must match the
general fused sweep exactly — same q-point physics on a dense per-patch
schedule.  The general sweep is validated against independent assembly
(test_fused.py, test_independent_assembly.py), so agreement here closes
the chain patch2d-Pallas == reference ``do_vmult_cell``
(operator_ns.cc:949-1182) on general 2D meshes (Turek 2D — the corridor
and validation configs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ns_gls_tpu.fem.constraints import AffineConstraints, distribute
from ns_gls_tpu.fem.space import FESpace
from ns_gls_tpu.mesh.generators import subdivided_hyper_rectangle
from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
from ns_gls_tpu.ops.time_integration import BDFIntegrator, SolutionHistory


def multiblock_mesh(nx=3, ny=2, n_refine=2):
    """Unstructured multiblock 2D mesh with a refinement chain: patches
    have m_ref = 2**n_refine cells per axis."""
    m = subdivided_hyper_rectangle((nx, ny), (0.0, 0.0), (1.1, 0.9))
    m.lattice = None  # force the general (patch2d) code path
    for _ in range(n_refine):
        m = m.refine()
    return m


def adaptive_mesh(nx=3, ny=2):
    """Adaptively refined mesh: mixed-depth cells -> multiple patch
    families (the refine-in-wake workflow, ``simulation.cc:317-326``)."""
    m = subdivided_hyper_rectangle((nx, ny), (0.0, 0.0), (1.1, 0.9))
    m.lattice = None
    m = m.refine_global(1)
    c = m.vertices[m.cells].mean(1)
    return m.refine(c[:, 0] < 0.5)


def make_pair(mesh, degree, increment, cell_wise):
    space = FESpace(mesh, degree)
    assert space.patch2d and not space.structured
    dim = 2
    C = dim + 1
    b = AffineConstraints(space.n_nodes, C)
    bn = space.boundary_nodes([0])
    b.add_dirichlet(bn, list(range(dim)),
                    values=[[1.0, 0.0]] * len(bn))
    ca = b.close()
    ti = BDFIntegrator(2)
    ti.update_dt(0.1)
    ti.update_dt(0.08)

    ops = []
    for use_s in (False, True):
        op = NavierStokesOperator(
            space, ca, ca, nu=0.02, c_1=4.0, c_2=2.0,
            time_integrator=ti, consider_time_derivative=True,
            increment_form=increment, cell_wise_stabilization=cell_wise,
            fuse_tables=True, dtype=jnp.float32, use_structured=use_s,
        )
        op.constraints_inhomogeneous = ca
        ops.append(op)
    assert ops[0]._p2sweep is None and ops[1]._p2sweep is not None

    rng = np.random.default_rng(0)
    u = distribute(
        ca, jnp.asarray(rng.standard_normal((space.n_nodes, C)), jnp.float32)
    )
    hist = SolutionHistory(
        [u]
        + [jnp.asarray(rng.standard_normal((space.n_nodes, C)), jnp.float32)
           for _ in range(2)]
    )
    for op in ops:
        op.set_previous_solution(hist)
        op.set_linearization_point(u)
    return ops, space, u


def check(mesh, degree, increment, cell_wise, tol=5e-6):
    (op_g, op_p), space, u = make_pair(mesh, degree, increment, cell_wise)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal(u.shape), jnp.float32)
    a = np.asarray(op_g.vmult(v))
    s = np.asarray(op_p.vmult(v))
    assert np.abs(a - s).max() <= tol * np.abs(a).max(), \
        np.abs(a - s).max() / np.abs(a).max()
    ra = np.asarray(op_g.evaluate_residual(u))
    rs = np.asarray(op_p.evaluate_residual(u))
    assert np.abs(ra - rs).max() <= tol * np.abs(ra).max(), \
        np.abs(ra - rs).max() / np.abs(ra).max()


@pytest.mark.parametrize("increment,cell_wise", [
    (False, True), (True, False), (True, True), (False, False),
])
def test_patch2d_q1(increment, cell_wise):
    check(multiblock_mesh(), 1, increment, cell_wise)


# ---------------------------------------------------------------------------
# adaptive meshes: per-size patch FAMILIES (multi-kernel sweep)
# ---------------------------------------------------------------------------
def test_patch2d_adaptive_families():
    """Mixed-depth cells decompose into maximal uniform patch families
    covering every cell exactly once."""
    from ns_gls_tpu.fem.space import FESpace

    space = FESpace(adaptive_mesh(), 1)
    fams = space.patch2d_families
    assert space.patch2d and len(fams) > 1
    assert sum(len(f["cells"]) for f in fams) == space.mesh.n_cells
    seen = np.concatenate([f["cells"] for f in fams])
    assert len(np.unique(seen)) == space.mesh.n_cells
    for f in fams:
        assert (f["patch_nodes"] >= 0).all()
        assert f["patch_nodes"].shape[1] == f["m"] * space.degree + 1


@pytest.mark.parametrize("degree", [1, 2])
def test_patch2d_adaptive_vs_independent(degree):
    """The multi-family Pallas sweep against the independent (numpy,
    f64) GLS assembly on an adaptively refined mesh.  The general f32
    sweep is NOT the reference here: its scatter/gather f32 summation
    noise on mixed-h meshes (~1e-3 of max) is larger than the patch
    kernel's own error (the kernel runs exact-f32 MXU passes)."""
    from ns_gls_tpu.fem.space import FESpace
    from ns_gls_tpu.ops.assembly_independent import assemble_gls_matrix

    mesh = adaptive_mesh(2, 1) if degree == 2 else adaptive_mesh()
    space = FESpace(mesh, degree)
    assert len(space.patch2d_families) > 1
    C = 3
    ca = AffineConstraints(space.n_nodes, C).close()
    ti = BDFIntegrator(2)
    ti.update_dt(0.1)
    ti.update_dt(0.08)
    op = NavierStokesOperator(
        space, ca, ca, nu=0.02, c_1=4.0, c_2=2.0,
        time_integrator=ti, consider_time_derivative=True,
        increment_form=False, cell_wise_stabilization=False,
        fuse_tables=True, dtype=jnp.float32, use_structured=True,
    )
    assert op._p2sweep is not None and op._p2sweep.multi
    op.constraints_inhomogeneous = ca
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((space.n_nodes, C)), jnp.float32)
    hist = SolutionHistory([u, u * 0.9, u * 0.8])
    op.set_previous_solution(hist)
    op.set_linearization_point(u)
    vec_old = np.asarray(
        hist.weighted_old_sum(tuple(jnp.asarray(w) for w in ti.weights))
    )
    A = assemble_gls_matrix(op, np.asarray(u), vec_old,
                            increment_form=False)
    v = jnp.asarray(rng.standard_normal(u.shape), jnp.float32)
    ref = (A @ np.asarray(v, np.float64).reshape(-1)).reshape(u.shape)
    s = np.asarray(op.vmult(v))
    assert np.abs(s - ref).max() <= 5e-5 * np.abs(ref).max(), \
        np.abs(s - ref).max() / np.abs(ref).max()


def test_patch2d_adaptive_residual_parity():
    """Residual flavor (exact-f32 MXU in BOTH sweeps) must agree
    tightly between the general and the multi-family patch sweep."""
    (op_g, op_p), space, u = make_pair(adaptive_mesh(), 1, True, False)
    assert op_p._p2sweep.multi
    ra = np.asarray(op_g.evaluate_residual(u))
    rs = np.asarray(op_p.evaluate_residual(u))
    assert np.abs(ra - rs).max() <= 5e-5 * max(np.abs(ra).max(), 1e-3), \
        np.abs(ra - rs).max() / np.abs(ra).max()


def test_patch2d_q2():
    check(multiblock_mesh(n_refine=1), 2, True, True)


def test_patch2d_single_cell_patches():
    """Mesh without a refinement chain: every cell is its own patch."""
    check(multiblock_mesh(nx=4, ny=3, n_refine=0), 2, True, False)


def test_patch2d_turek2d():
    """The actual target geometry: curved (cylindrical-manifold) Turek
    2D mesh — validates the general per-cell per-q geometry tables on
    curved cells."""
    from ns_gls_tpu.mesh.cylinder import cylinder_mesh_2d

    check(cylinder_mesh_2d().refine_global(1), 2, True, False)


def test_patch2d_gates():
    """Unsupported configurations must fall back (tables builder -> None)."""
    from ns_gls_tpu.ops.patch2d import build_patch2d_tables

    from ns_gls_tpu.ops.time_integration import ThetaIntegrator

    mesh = multiblock_mesh(n_refine=1)
    space = FESpace(mesh, 1)
    ca = AffineConstraints(space.n_nodes, 3).close()
    ti = ThetaIntegrator(0.5)
    ti.update_dt(0.1)
    op = NavierStokesOperator(
        space, ca, ca, nu=0.02, c_1=4.0, c_2=2.0,
        time_integrator=ti, consider_time_derivative=True,
        fuse_tables=True, dtype=jnp.float32, use_structured=False,
    )
    assert build_patch2d_tables(op) is None      # theta method unsupported


def test_patch2d_adaptive_claims_families():
    """Adaptive meshes claim the patch2d numbering as per-size patch
    FAMILIES (round 5; previously they fell back to the general
    numbering) and keep the general sweep's gather classes through the
    count-sorted permutation."""
    m = multiblock_mesh(n_refine=1)
    flags = np.zeros(m.n_cells, bool)
    flags[:2] = True
    m2 = m.refine(flags)
    space = FESpace(m2, 1)
    assert space.patch2d
    assert len(space.patch2d_families) > 1
    assert space.node_gather_classes and space.node_gather_perm is not None
