"""Independent-assembly cross-check (VERDICT r1 #8; SURVEY §4 redundancy
strategy): the matrix-free q-point kernel vs a from-the-weak-form
quadrature-loop NumPy assembly (``ops/assembly_independent.py``), sharing
no physics code. Reference role: ``operator_ns.cc:1600-1756``."""

import jax.numpy as jnp
import numpy as np
import pytest

from ns_gls_tpu.fem.constraints import AffineConstraints
from ns_gls_tpu.fem.space import FESpace
from ns_gls_tpu.mesh.generators import subdivided_hyper_rectangle
from ns_gls_tpu.ops.assembly_independent import assemble_gls_matrix
from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
from ns_gls_tpu.ops.time_integration import (
    BDFIntegrator,
    SolutionHistory,
    ThetaIntegrator,
)


def build(dim, degree, increment_form, cell_wise, theta=None,
          consider_dt=True):
    mesh = subdivided_hyper_rectangle(
        (2,) * dim, (0.0,) * dim, (1.0,) * dim, colorize=True
    ).refine_global(1)
    space = FESpace(mesh, degree)
    C = dim + 1
    ca = AffineConstraints(space.n_nodes, C).close(jnp.float64)
    if theta is not None:
        ti = ThetaIntegrator(theta)
        ti.update_dt(0.05)
    else:
        ti = BDFIntegrator(2)
        ti.update_dt(0.04)
        ti.update_dt(0.05)
    op = NavierStokesOperator(
        space, ca, ca, nu=0.01, c_1=4.0, c_2=2.0, time_integrator=ti,
        consider_time_derivative=consider_dt,
        increment_form=increment_form,
        cell_wise_stabilization=cell_wise, dtype=jnp.float64,
    )
    op.constraints_inhomogeneous = ca
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((space.n_nodes, C)))
    hist = SolutionHistory([u, u * 0.9, u * 0.8])
    op.set_previous_solution(hist)
    op.set_linearization_point(u)
    vec_old = np.asarray(
        hist.weighted_old_sum(tuple(jnp.asarray(w) for w in ti.weights))
    )
    return op, space, np.asarray(u), vec_old


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("increment_form", [False, True])
@pytest.mark.parametrize("cell_wise", [True, False])
def test_matrix_free_matches_independent_assembly(dim, increment_form,
                                                  cell_wise):
    degree = 2 if dim == 2 else 1
    op, space, u, vec_old = build(dim, degree, increment_form, cell_wise)
    A = assemble_gls_matrix(op, u, vec_old, increment_form=increment_form)

    rng = np.random.default_rng(7)
    v = rng.standard_normal((space.n_nodes, dim + 1))
    got = np.asarray(op.vmult(jnp.asarray(v)))
    want = (A @ v.reshape(-1)).reshape(v.shape)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 1e-11 * max(scale, 1.0), (
        np.abs(got - want).max(), scale
    )


def test_theta_scheme_matches_independent_assembly():
    op, space, u, vec_old = build(2, 1, False, True, theta=0.6)
    A = assemble_gls_matrix(op, u, vec_old, increment_form=False)
    rng = np.random.default_rng(11)
    v = rng.standard_normal((space.n_nodes, 3))
    got = np.asarray(op.vmult(jnp.asarray(v)))
    want = (A @ v.reshape(-1)).reshape(v.shape)
    assert np.abs(got - want).max() < 1e-11 * max(np.abs(want).max(), 1.0)


def test_no_time_derivative_flag():
    op, space, u, vec_old = build(2, 1, False, True, consider_dt=False)
    A = assemble_gls_matrix(op, u, vec_old, increment_form=False)
    rng = np.random.default_rng(13)
    v = rng.standard_normal((space.n_nodes, 3))
    got = np.asarray(op.vmult(jnp.asarray(v)))
    want = (A @ v.reshape(-1)).reshape(v.shape)
    assert np.abs(got - want).max() < 1e-11 * max(np.abs(want).max(), 1.0)


def test_assemble_dense_device_matches_host():
    """Device-side dense assembly + CᵀAC sandwich (one dispatch, GMG
    direct coarse) must reproduce the host assemble_dense, including
    weighted (non-Dirichlet) constraint rows."""
    import jax.numpy as jnp

    from ns_gls_tpu.fem.constraints import AffineConstraints, distribute
    from ns_gls_tpu.fem.space import FESpace
    from ns_gls_tpu.mesh.generators import subdivided_hyper_rectangle
    from ns_gls_tpu.ops.assembly import assemble_dense, assemble_dense_device
    from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
    from ns_gls_tpu.ops.time_integration import BDFIntegrator, SolutionHistory

    mesh = subdivided_hyper_rectangle((3, 2), (0.0, 0.0), (1.5, 1.0),
                                      colorize=True)
    space = FESpace(mesh, 1)
    C = 3
    b = AffineConstraints(space.n_nodes, C)
    bn = space.boundary_nodes([0])
    b.add_dirichlet(bn, [0, 1], values=[[1.0, 0.0]] * len(bn))
    # weighted constraint rows (slip-like): u_y(n) = -0.5 u_x(n)
    top = [n for n in space.boundary_nodes([3]) if n not in set(bn)]
    for n in top[:2]:
        b.add_line(b.dof(n, 1), [(b.dof(n, 0), -0.5)], 0.0)
    ca = b.close(jnp.float32)
    ti = BDFIntegrator(1)
    ti.update_dt(0.1)
    op = NavierStokesOperator(
        space, ca, ca, nu=0.05, c_1=4.0, c_2=2.0, time_integrator=ti,
        consider_time_derivative=True, increment_form=True,
        cell_wise_stabilization=True, dtype=jnp.float32,
    )
    op.constraints_inhomogeneous = ca
    rng = np.random.default_rng(0)
    u = distribute(
        ca, jnp.asarray(rng.standard_normal((space.n_nodes, C)),
                        jnp.float32)
    )
    op.set_previous_solution(SolutionHistory([u, u]))
    op.set_linearization_point(u)

    A_h = assemble_dense(op)
    A_d = np.asarray(assemble_dense_device(op), dtype=np.float64)
    scale = np.abs(A_h).max()
    assert np.abs(A_h - A_d).max() <= 2e-5 * scale, (
        np.abs(A_h - A_d).max() / scale
    )
