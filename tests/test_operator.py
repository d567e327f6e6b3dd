"""Operator correctness tests.

The reference's own QA strategy is redundancy (matrix-free vs. assembled,
SURVEY §4); we reproduce it:
- vmult ≡ assembled dense matrix (both flavors, 2D/3D, Q1/Q2),
- Newton increment form ≡ finite-difference Jacobian of the residual,
- evaluate_rhs/evaluate_residual consistency,
- stabilization parameter formulas vs. hand-computed values.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ns_gls_tpu.fem.constraints import AffineConstraints
from ns_gls_tpu.fem.space import FESpace
from ns_gls_tpu.mesh.generators import subdivided_hyper_rectangle
from ns_gls_tpu.ops import assembly
from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
from ns_gls_tpu.ops.time_integration import BDFIntegrator, SolutionHistory


def make_setup(dim=2, degree=1, increment_form=False, with_bc=True,
               cell_wise=True, nu=0.05, refinements=1):
    n_sub = (2,) * dim
    mesh = subdivided_hyper_rectangle(
        n_sub, (0.0,) * dim, (1.0,) * dim, colorize=True
    ).refine_global(refinements)
    space = FESpace(mesh, degree)
    C = dim + 1

    builder = AffineConstraints(space.n_nodes, C)
    if with_bc:
        inflow = space.boundary_nodes([0])
        builder.add_dirichlet(inflow, list(range(dim)),
                              values=[[1.0] + [0.0] * (dim - 1)] * len(inflow))
        outflow = space.boundary_nodes([1])
        builder.add_dirichlet(outflow, [dim])  # pressure pin
    ca_hom = builder.close()
    # inhomogeneous set: same rows, real values
    ca_inhom = ca_hom

    ti = BDFIntegrator(2)
    ti.update_dt(0.1)
    ti.update_dt(0.1)

    op = NavierStokesOperator(
        space, ca_hom, ca_hom,
        nu=nu, c_1=4.0, c_2=2.0,
        time_integrator=ti,
        consider_time_derivative=True,
        increment_form=increment_form,
        cell_wise_stabilization=cell_wise,
    )
    op.constraints_inhomogeneous = ca_inhom

    rng = np.random.default_rng(42)
    u_lin = jnp.asarray(rng.standard_normal((space.n_nodes, C)))
    # the linearization point must satisfy the constraints (the driver
    # maintains this invariant, like the reference: solution always has
    # constraints distributed before set_linearization_point)
    from ns_gls_tpu.fem.constraints import distribute

    u_lin = distribute(ca_inhom, u_lin)
    hist = SolutionHistory(
        [jnp.asarray(rng.standard_normal((space.n_nodes, C))) for _ in range(3)]
    )
    op.set_previous_solution(hist)
    op.set_linearization_point(u_lin)
    return op, space, u_lin


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("increment", [False, True])
@pytest.mark.parametrize("cell_wise", [True, False])
def test_vmult_equals_assembled(dim, increment, cell_wise):
    degree = 2 if dim == 2 else 1
    op, space, _ = make_setup(dim=dim, degree=degree,
                              increment_form=increment, cell_wise=cell_wise,
                              refinements=1 if dim == 2 else 0)
    A = assembly.assemble_dense(op)
    rng = np.random.default_rng(1)
    v = rng.standard_normal((space.n_nodes, dim + 1))
    lhs = np.asarray(op.vmult(jnp.asarray(v))).reshape(-1)
    rhs = A @ v.reshape(-1)
    assert np.allclose(lhs, rhs, atol=1e-11), np.abs(lhs - rhs).max()


def test_newton_increment_is_fd_jacobian():
    """Increment form ≡ d/du of the residual form (delta frozen).

    The reference's Newton system (``operator_ns.cc:937-947``) linearizes
    both convection slots and the SUPG test function, but not delta(u);
    freeze delta and compare with finite differences."""
    op, space, u0 = make_setup(dim=2, degree=1, increment_form=True)
    C = 3
    frozen = (op.state.delta1, op.state.delta2)

    def residual_at(w):
        # move linearization point to w but keep delta frozen
        op.set_linearization_point(w)
        op.state = op.state._replace(delta1=frozen[0], delta2=frozen[1])
        return op.evaluate_residual(w)

    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.standard_normal((space.n_nodes, C)))
    # Newton acts in the constrained subspace: perturb only unconstrained
    # dofs (constrained entries influence the residual through the u* slot
    # but are never free unknowns).
    from ns_gls_tpu.fem.constraints import set_zero

    v = set_zero(op.constraints_homogeneous, v)
    eps = 1e-6
    r_plus = residual_at(u0 + eps * v)
    r_minus = residual_at(u0 - eps * v)
    fd = (r_minus - r_plus) / (2 * eps)  # residual = -F  =>  J v = -dR/du v

    op.set_linearization_point(u0)
    op.state = op.state._replace(delta1=frozen[0], delta2=frozen[1])
    jv = op.vmult(v)

    # compare on unconstrained rows (vmult copies src on constrained rows)
    mask = np.ones(space.n_nodes * C, dtype=bool)
    mask[np.asarray(op.constraints_homogeneous.rows)] = False
    fd = np.asarray(fd).reshape(-1)[mask]
    jv = np.asarray(jv).reshape(-1)[mask]
    assert np.allclose(fd, jv, rtol=1e-5, atol=1e-6), np.abs(fd - jv).max()


def test_fixed_point_residual_consistency():
    """For the fixed-point (non-increment) operator, the residual at u
    with linearization point u equals vmult(u) minus the constant part
    (history), negated: R(u) = -(A(u*) u - b)."""
    op, space, u0 = make_setup(dim=2, degree=1, increment_form=False)
    r = op.evaluate_residual(u0)
    # A u0 (vmult) + history term = -(residual) on unconstrained rows
    Au = op.vmult(u0)
    rhs = op.evaluate_rhs()  # = -(A*0 + const) = -const
    mask = np.ones(space.n_nodes * (space.dim + 1), dtype=bool)
    mask[np.asarray(op.constraints_homogeneous.rows)] = False
    lhs = np.asarray(-r).reshape(-1)[mask]
    ref = np.asarray(Au).reshape(-1)[mask] - np.asarray(rhs).reshape(-1)[mask]
    assert np.allclose(lhs, ref, atol=1e-10), np.abs(lhs - ref).max()


def test_penalty_parameters_cell_wise():
    op, space, u0 = make_setup(dim=2, degree=1, cell_wise=True, nu=0.05)
    d1 = np.asarray(op.state.delta1)
    d2 = np.asarray(op.state.delta2)
    # manual: advective branch since nu=0.05 < h=0.25
    b = op.batch
    u_loc = u0[np.asarray(b.cell_nodes)][..., :2]
    val = np.einsum("qi,eic->eqc", np.asarray(b.S), u_loc)
    u_max = np.sqrt((val**2).sum(-1)).max(axis=1)
    h = np.asarray(b.h_min_vertex)
    stau = 1.0 / 0.1
    expect_d1 = 4.0 / np.sqrt(stau**2 + u_max**2 / h**2)
    expect_d2 = 2.0 * h
    assert np.allclose(d1[:, 0], expect_d1)
    assert np.allclose(d2[:, 0], expect_d2)


def test_penalty_parameters_q_wise():
    op, space, u0 = make_setup(dim=2, degree=1, cell_wise=False, nu=0.05)
    d1 = np.asarray(op.state.delta1)
    b = op.batch
    u_loc = u0[np.asarray(b.cell_nodes)][..., :2]
    val = np.einsum("qi,eic->eqc", np.asarray(b.S), u_loc)
    u2 = 1e-12 + (val**2).sum(-1)
    h = np.asarray(b.h_q)[:, None]
    stau = 1.0 / 0.1
    expect = 1.0 / np.sqrt(stau**2 + 4 * u2 / h**2 + 9 * (4 * 0.05 / h**2) ** 2)
    assert np.allclose(d1, expect)


def test_get_max_u():
    op, space, u0 = make_setup()
    m = op.get_max_u(u0)
    b = op.batch
    u_loc = u0[np.asarray(b.cell_nodes)][..., :2]
    val = np.einsum("qi,eic->eqc", np.asarray(b.S), u_loc)
    assert np.isclose(m, np.sqrt((val**2).sum(-1)).max())
