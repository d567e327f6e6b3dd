"""Constraint engine unit tests: Dirichlet, periodic, slip, chains."""

import jax.numpy as jnp
import numpy as np

from ns_gls_tpu.fem.constraints import (
    AffineConstraints,
    condense_transpose,
    copy_constrained,
    distribute,
    set_zero,
)


def test_dirichlet_distribute():
    b = AffineConstraints(4, 2)
    b.add_dirichlet([1, 2], [0], values=[[3.0], [4.0]])
    ca = b.close()
    u = jnp.zeros((4, 2))
    u = distribute(ca, u)
    assert u[1, 0] == 3.0 and u[2, 0] == 4.0
    assert np.allclose(distribute(ca, u, homogeneous=True)[1, 0], 0.0)


def test_periodic_and_setzero():
    b = AffineConstraints(4, 1)
    b.add_periodic([0], [3], [0])
    ca = b.close()
    u = jnp.asarray(np.arange(4.0)[:, None])
    u2 = distribute(ca, u)
    assert u2[0, 0] == 3.0
    assert set_zero(ca, u2)[0, 0] == 0.0


def test_slip_constraint():
    b = AffineConstraints(2, 3)
    n = np.array([[0.6, 0.8]])
    b.add_no_normal_flux([0], n)
    ca = b.close()
    u = jnp.asarray(np.array([[1.0, 2.0, 5.0], [1.0, 1.0, 1.0]]))
    u2 = np.asarray(distribute(ca, u))
    # constrained comp = argmax|n| = y: u_y = -(nx/ny) u_x
    assert np.isclose(u2[0, 1], -0.6 / 0.8 * 1.0)
    assert np.isclose(u2[0, 0], 1.0)  # untouched
    assert np.isclose(n[0] @ u2[0, :2], 0.0)


def test_chain_resolution():
    b = AffineConstraints(4, 1)
    b.add_line(0, [(1, 2.0)], 1.0)   # u0 = 2 u1 + 1
    b.add_line(1, [(2, 3.0)], 0.5)   # u1 = 3 u2 + 0.5
    ca = b.close()
    u = jnp.asarray(np.array([0.0, 0.0, 2.0, 0.0])[:, None])
    u2 = np.asarray(distribute(ca, u))
    assert np.isclose(u2[1, 0], 6.5)
    assert np.isclose(u2[0, 0], 2 * 6.5 + 1.0)


def test_condense_transpose_adjoint():
    """<C u, r> == <u, Cᵀ r> on the unconstrained subspace."""
    rng = np.random.default_rng(0)
    b = AffineConstraints(6, 1)
    b.add_line(2, [(0, 0.5), (4, 0.5)], 0.0)
    ca = b.close()
    u = jnp.asarray(rng.standard_normal((6, 1)))
    r = jnp.asarray(rng.standard_normal((6, 1)))
    Cu = distribute(ca, set_zero(ca, u), homogeneous=True)
    lhs = float(jnp.vdot(Cu, r))
    Ctr = condense_transpose(ca, r)
    rhs = float(jnp.vdot(set_zero(ca, u), Ctr))
    assert np.isclose(lhs, rhs)


def test_copy_constrained():
    b = AffineConstraints(3, 1)
    b.add_dirichlet([1], [0])
    ca = b.close()
    dst = jnp.zeros((3, 1))
    src = jnp.ones((3, 1)) * 7.0
    out = copy_constrained(ca, dst, src)
    assert out[1, 0] == 7.0 and out[0, 0] == 0.0
