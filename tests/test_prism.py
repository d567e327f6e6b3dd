"""Prism (extruded-mesh) Pallas fast path (ops/prism.py) must match the
general fused sweep exactly — same q-point physics, patch/z-product
schedule.  The general sweep is itself validated against independent
assembly (test_fused.py, test_independent_assembly.py), so agreement
here closes the chain prism-Pallas == reference ``do_vmult_cell``
(operator_ns.cc:949-1182) on the extruded flagship meshes
(``grid_cylinder.h:153-242``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ns_gls_tpu.fem.constraints import AffineConstraints, distribute
from ns_gls_tpu.fem.space import FESpace
from ns_gls_tpu.mesh.generators import extrude, subdivided_hyper_rectangle
from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
from ns_gls_tpu.ops.time_integration import BDFIntegrator, SolutionHistory


def prism_mesh(n_refine=1):
    """Extruded unstructured-2D-factor mesh with a refinement chain, so
    patches have m_ref = 2**n_refine cells per axis."""
    m2 = subdivided_hyper_rectangle((2, 2), (0.0, 0.0), (1.1, 0.9))
    m2.lattice = None  # force the unstructured (prism) code path
    mesh = extrude(m2, 2, 0.7)
    for _ in range(n_refine):
        mesh = mesh.refine()
    return mesh


def make_pair(mesh, degree, increment, cell_wise):
    space = FESpace(mesh, degree)
    assert space.prism and not space.structured
    dim = 3
    C = dim + 1
    b = AffineConstraints(space.n_nodes, C)
    bn = space.boundary_nodes([0])
    b.add_dirichlet(bn, list(range(dim)),
                    values=[[1.0, 0.0, 0.0]] * len(bn))
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
    assert ops[0]._psweep is None and ops[1]._psweep is not None

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
def test_prism_q1(increment, cell_wise):
    check(prism_mesh(1), 1, increment, cell_wise)


@pytest.mark.slow
def test_prism_q2():
    check(prism_mesh(1), 2, True, True)


@pytest.mark.slow
def test_prism_turek3d():
    """The actual flagship geometry: curved (cylindrical-manifold) Turek
    3D mesh — validates the prismatic-geometry packing (layer-0 column
    representative) on curved cells."""
    from ns_gls_tpu.mesh.cylinder import cylinder_mesh_3d

    mesh = cylinder_mesh_3d()
    check(mesh, 1, True, True)


def test_prism_wide_narrow_parity(monkeypatch):
    """The wide-batched MXU contraction schedule must reproduce the
    per-(comp, plane) narrow schedule (both contract identical
    operands; only the issue grouping differs)."""
    mesh = prism_mesh(1)
    monkeypatch.setenv("NS_PRISM_WIDE", "1")
    (_, op_wide), space, u = make_pair(mesh, 1, True, True)
    assert op_wide._psweep.wide
    monkeypatch.setenv("NS_PRISM_WIDE", "0")
    (_, op_narrow), _, _ = make_pair(mesh, 1, True, True)
    assert not op_narrow._psweep.wide
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal(u.shape), jnp.float32)
    a = np.asarray(op_narrow.vmult(v))
    b = np.asarray(op_wide.vmult(v))
    assert np.abs(a - b).max() <= 2e-6 * np.abs(a).max()


def test_prism_gates():
    """Unsupported configurations must fall back (tables builder -> None)."""
    mesh = prism_mesh(0)
    space = FESpace(mesh, 1)
    C = 4
    ca = AffineConstraints(space.n_nodes, C).close()
    # theta-method falls back (prism kernel is BDF/stationary only)
    from ns_gls_tpu.ops.time_integration import ThetaIntegrator

    ti = ThetaIntegrator(0.5)
    ti.update_dt(0.1)
    op = NavierStokesOperator(space, ca, ca, nu=0.02, c_1=4.0, c_2=2.0,
                              time_integrator=ti, dtype=jnp.float32,
                              use_structured=True)
    assert op._psweep is None
    # f64 falls back
    ti2 = BDFIntegrator(1)
    ti2.update_dt(0.1)
    op2 = NavierStokesOperator(space, ca, ca, nu=0.02, c_1=4.0, c_2=2.0,
                               time_integrator=ti2, dtype=jnp.float64,
                               use_structured=True)
    assert op2._psweep is None
