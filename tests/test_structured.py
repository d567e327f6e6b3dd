"""Structured-lattice Pallas fast path (ops/structured.py) must match the
general fused sweep exactly (same q-point physics, different schedule).

The general sweep is itself validated against the cached-table mode and
the independent assembly (test_fused.py, test_independent_assembly.py),
so roundoff-level agreement here closes the chain
structured-Pallas == reference ``do_vmult_cell`` (operator_ns.cc:949-1182).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ns_gls_tpu.fem.constraints import AffineConstraints, distribute
from ns_gls_tpu.fem.space import FESpace
from ns_gls_tpu.mesh.generators import subdivided_hyper_rectangle
from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
from ns_gls_tpu.ops.time_integration import BDFIntegrator, SolutionHistory


def make_pair(dim, degree, increment, cell_wise, shear=0.0):
    mesh = subdivided_hyper_rectangle(
        (3, 2) + ((2,) if dim == 3 else ()),
        (0.0,) * dim,
        (1.2, 1.0) + ((0.8,) if dim == 3 else ()),
        colorize=True,
    )
    if shear:
        # sheared parallelogram lattice: still structured/affine, but the
        # Jacobian picks up off-diagonal entries (covers the non-diagonal
        # geometry branch of the Pallas kernels)
        v = mesh.vertices.copy()
        v[:, 0] = v[:, 0] + shear * v[:, 1]
        mesh = dataclasses.replace(mesh, vertices=v)
    space = FESpace(mesh, degree)
    assert space.structured
    C = dim + 1
    b = AffineConstraints(space.n_nodes, C)
    bn = space.boundary_nodes([0])
    b.add_dirichlet(bn, list(range(dim)),
                    values=[[1.0] + [0.0] * (dim - 1)] * len(bn))
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
    assert ops[0]._ssweep is None and ops[1]._ssweep is not None

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


def check(dim, degree, increment, cell_wise, tol=5e-6, shear=0.0):
    (op_g, op_s), space, u = make_pair(dim, degree, increment, cell_wise,
                                       shear=shear)
    assert op_s._ssweep.diag_geom == (shear == 0.0)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal(u.shape), jnp.float32)
    a = np.asarray(op_g.vmult(v))
    s = np.asarray(op_s.vmult(v))
    assert np.abs(a - s).max() <= tol * np.abs(a).max(), \
        np.abs(a - s).max() / np.abs(a).max()
    ra = np.asarray(op_g.evaluate_residual(u))
    rs = np.asarray(op_s.evaluate_residual(u))
    assert np.abs(ra - rs).max() <= tol * np.abs(ra).max(), \
        np.abs(ra - rs).max() / np.abs(ra).max()


@pytest.mark.parametrize("degree,increment,cell_wise", [
    (1, False, True), (1, True, False), (2, True, True), (2, False, False),
])
def test_structured_2d(degree, increment, cell_wise):
    check(2, degree, increment, cell_wise)


@pytest.mark.parametrize("increment,cell_wise", [(False, False), (True, True)])
def test_structured_3d_q1(increment, cell_wise):
    check(3, 1, increment, cell_wise)


@pytest.mark.slow
@pytest.mark.parametrize("increment", [False, True])
def test_structured_3d_q2(increment):
    check(3, 2, increment, True)


@pytest.mark.parametrize("dim", [2, 3])
def test_structured_sheared(dim):
    """Non-diagonal affine lattice (sheared): exercises the full
    jinv contraction branch of the kernels."""
    check(dim, 1, True, True, shear=0.35)


def test_structured_gates():
    """Unsupported configurations must fall back (tables builder -> None)."""
    mesh = subdivided_hyper_rectangle((2, 2), (0.0, 0.0), (1.0, 1.0),
                                      colorize=True)
    space = FESpace(mesh, 1)
    C = 3
    ca = AffineConstraints(space.n_nodes, C).close()
    ti = BDFIntegrator(1)
    ti.update_dt(0.1)
    # f64 falls back
    op = NavierStokesOperator(space, ca, ca, nu=0.02, c_1=4.0, c_2=2.0,
                              time_integrator=ti, dtype=jnp.float64)
    assert op._ssweep is None
    # unstructured mesh falls back
    mesh2 = subdivided_hyper_rectangle((2, 2), (0.0, 0.0), (1.0, 1.0),
                                       colorize=True)
    mesh2.lattice = None
    space2 = FESpace(mesh2, 1)
    ca2 = AffineConstraints(space2.n_nodes, C).close()
    op2 = NavierStokesOperator(space2, ca2, ca2, nu=0.02, c_1=4.0, c_2=2.0,
                               time_integrator=ti, dtype=jnp.float32)
    assert op2._ssweep is None
