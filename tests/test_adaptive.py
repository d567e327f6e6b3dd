"""Adaptive refinement + hanging-node constraints (deal.II
``make_hanging_node_constraints`` parity; p4est 2:1 balance)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ns_gls_tpu.fem.constraints import AffineConstraints, distribute
from ns_gls_tpu.fem.hanging import hanging_node_constraints
from ns_gls_tpu.fem.space import FESpace
from ns_gls_tpu.mesh.generators import subdivided_hyper_rectangle


def adaptive_mesh(dim, degree_hint=1):
    """Refine the left half of a rectangle once (one hanging interface)."""
    m = subdivided_hyper_rectangle((2,) * dim, (0.0,) * dim, (2.0,) * dim,
                                   colorize=True).refine_global(1)
    centers = m.vertices[m.cells].mean(axis=1)
    m2 = m.refine(centers[:, 0] < 1.0)
    return m2


@pytest.mark.parametrize("dim", [2, 3])
def test_adaptive_refine_geometry(dim):
    m2 = adaptive_mesh(dim)
    sp = FESpace(m2, 1)
    assert np.isclose(sp.jxw.sum(), 2.0**dim)
    assert m2.is_adaptive
    assert set(np.unique(m2.cell_level)) == {1, 2}
    # boundary ids survive
    bids = m2.boundary_ids[m2.boundary_ids >= 0]
    assert len(bids) > 0


def test_two_to_one_smoothing():
    m = subdivided_hyper_rectangle((4, 1), (0, 0), (4, 1)).refine_global(1)
    # refine only the leftmost cell twice: smoothing must grade levels
    for _ in range(2):
        centers = m.vertices[m.cells].mean(axis=1)
        flags = (centers[:, 0] < 0.5) & (centers[:, 1] < 0.5)
        m = m.refine(flags)
    lv = m.cell_level
    # vertex-adjacent cells differ by at most 1 level
    vmax = np.full(m.n_vertices, -1)
    np.maximum.at(vmax, m.cells.reshape(-1), np.repeat(lv, m.cells.shape[1]))
    for c in range(m.n_cells):
        assert vmax[m.cells[c]].max() - lv[c] <= 1


@pytest.mark.parametrize("dim,degree", [(2, 1), (2, 2), (3, 1), (3, 2)])
def test_hanging_constraints_polynomial_exact(dim, degree):
    """Interpolating a polynomial of the FE space must satisfy all hanging
    constraints exactly (continuity across the interface)."""
    m2 = adaptive_mesh(dim)
    sp = FESpace(m2, degree)
    hg = hanging_node_constraints(sp)
    assert len(hg) > 0, "expected hanging nodes"

    def f(x):
        out = np.ones(len(x))
        for d in range(dim):
            out *= (0.3 + x[:, d]) ** degree
        return out

    vals = f(sp.node_pos)
    for node, masters, weights in hg:
        interp = sum(w * vals[mn] for mn, w in zip(masters, weights))
        assert np.isclose(interp, vals[node], atol=1e-10), (node, interp)


def test_hanging_operator_consistency():
    """vmult with hanging constraints == assembled matrix with the same
    constraint sandwich (the redundancy cross-check on an adaptive mesh)."""
    from ns_gls_tpu.ops import assembly
    from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
    from ns_gls_tpu.ops.time_integration import BDFIntegrator, SolutionHistory

    m2 = adaptive_mesh(2)
    sp = FESpace(m2, 1)
    C = 3
    b = AffineConstraints(sp.n_nodes, C)
    b.add_dirichlet(sp.boundary_nodes([0]), [0, 1])
    for node, masters, weights in hanging_node_constraints(sp):
        b.add_hanging_node(node, None, masters, weights)
    ca = b.close()

    ti = BDFIntegrator(1)
    ti.update_dt(0.1)
    op = NavierStokesOperator(sp, ca, ca, nu=0.05, c_1=4.0, c_2=2.0,
                              time_integrator=ti,
                              consider_time_derivative=True)
    op.constraints_inhomogeneous = ca
    rng = np.random.default_rng(0)
    u = distribute(ca, jnp.asarray(rng.standard_normal((sp.n_nodes, C))))
    hist = SolutionHistory([u, 0.7 * u])
    op.set_previous_solution(hist)
    op.set_linearization_point(u)

    A = assembly.assemble_dense(op)
    v = rng.standard_normal((sp.n_nodes, C))
    lhs = np.asarray(op.vmult(jnp.asarray(v))).reshape(-1)
    rhs = A @ v.reshape(-1)
    assert np.allclose(lhs, rhs, atol=1e-10), np.abs(lhs - rhs).max()


def test_hanging_residual_jacobian_consistency():
    """Finite-difference check: d/deps residual(u + eps v) == vmult(v) on a
    mesh WITH hanging nodes.  Regression for the missing write-side Cᵀ in
    the residual path: master rows must receive hanging-slave contributions
    (deal.II ``distribute_local_to_global`` semantics) or Newton's Jacobian
    is inconsistent with the residual and diverges (seen on rotation.json)."""
    from ns_gls_tpu.fem.constraints import set_zero
    from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
    from ns_gls_tpu.ops.time_integration import BDFIntegrator, SolutionHistory

    m2 = adaptive_mesh(2)
    sp = FESpace(m2, 1)
    C = 3
    b = AffineConstraints(sp.n_nodes, C)
    b.add_dirichlet(sp.boundary_nodes([0]), [0, 1])
    for node, masters, weights in hanging_node_constraints(sp):
        b.add_hanging_node(node, None, masters, weights)
    ca = b.close()

    ti = BDFIntegrator(1)
    ti.update_dt(0.01)
    op = NavierStokesOperator(sp, ca, ca, nu=0.05, c_1=4.0, c_2=0.0,
                              time_integrator=ti,
                              consider_time_derivative=True,
                              increment_form=True,
                              cell_wise_stabilization=False)
    op.constraints_inhomogeneous = ca
    rng = np.random.default_rng(0)
    u0 = distribute(ca, jnp.asarray(rng.standard_normal((sp.n_nodes, C))))
    hist = SolutionHistory([u0, 0.8 * u0])
    op.set_previous_solution(hist)
    op.set_linearization_point(u0)
    frozen = (op.state.delta1, op.state.delta2)

    def residual_at(w):
        op.set_linearization_point(w)
        op.state = op.state._replace(delta1=frozen[0], delta2=frozen[1])
        return op.evaluate_residual(w)

    v = jnp.asarray(rng.standard_normal(u0.shape))
    v = distribute(ca, set_zero(ca, v), homogeneous=True)
    eps = 1e-6
    fd = (residual_at(u0 - eps * v) - residual_at(u0 + eps * v)) / (2 * eps)
    op.set_linearization_point(u0)
    op.state = op.state._replace(delta1=frozen[0], delta2=frozen[1])
    jv = op.vmult(set_zero(ca, v))
    mask = np.ones(u0.size, bool)
    mask[np.asarray(ca.rows)] = False
    err = np.abs(
        np.asarray(fd).reshape(-1)[mask] - np.asarray(jv).reshape(-1)[mask]
    ).max()
    assert err < 1e-6, err


def test_adaptive_transfer():
    """Prolongation on an adaptive pair must reproduce coarse-space
    polynomials exactly (carried cells via identity)."""
    from ns_gls_tpu.fem.transfer import (
        build_transfer,
        interpolate_to_coarse,
        prolongate,
    )

    m = subdivided_hyper_rectangle((2, 2), (0, 0), (2, 2)).refine_global(1)
    centers = m.vertices[m.cells].mean(axis=1)
    m2 = m.refine(centers[:, 0] < 1.0)
    sc, sf = FESpace(m, 2), FESpace(m2, 2)
    t = build_transfer(sc, sf, dtype=jnp.float64)

    def f(x):
        return (x[:, 0] + 0.5) ** 2 * (x[:, 1] - 0.3) ** 2

    u_c = jnp.asarray(f(sc.node_pos))[:, None] * jnp.ones((1, 3))
    u_f = prolongate(t, u_c)
    assert np.allclose(np.asarray(u_f[:, 0]), f(sf.node_pos), atol=1e-12)
    u_b = interpolate_to_coarse(t, u_f)
    assert np.allclose(np.asarray(u_b), np.asarray(u_c), atol=1e-12)
