"""MG transfer tests: prolongation exactness, restriction adjointness,
solution interpolation."""

import jax.numpy as jnp
import numpy as np
import pytest

from ns_gls_tpu.fem.space import FESpace
from ns_gls_tpu.fem.transfer import (
    build_transfer,
    interpolate_to_coarse,
    prolongate,
    restrict,
)
from ns_gls_tpu.mesh.generators import subdivided_hyper_rectangle


@pytest.mark.parametrize("dim,degree", [(2, 1), (2, 2), (3, 1), (3, 2)])
def test_prolongation_exact_for_polynomials(dim, degree):
    """P must reproduce any function in the coarse space exactly, and
    coarse<->fine interpolation round-trips."""
    mesh_c = subdivided_hyper_rectangle(
        (2,) * dim, (0.0,) * dim, (1.0,) * dim
    )
    mesh_f = mesh_c.refine()
    sc = FESpace(mesh_c, degree)
    sf = FESpace(mesh_f, degree)
    t = build_transfer(sc, sf, dtype=jnp.float64)

    # polynomial of total degree <= degree in each variable
    def f(x):
        out = np.ones(len(x))
        for d in range(dim):
            out *= (x[:, d] + 0.3) ** degree
        return out

    u_c = jnp.asarray(f(sc.node_pos))[:, None] * jnp.ones((1, 2))
    u_f = prolongate(t, u_c)
    expect = f(sf.node_pos)
    assert np.allclose(np.asarray(u_f[:, 0]), expect, atol=1e-12)

    # interpolation back to coarse is exact for fine fields in coarse space
    u_back = interpolate_to_coarse(t, u_f)
    assert np.allclose(np.asarray(u_back), np.asarray(u_c), atol=1e-12)


def test_restriction_is_transpose():
    mesh_c = subdivided_hyper_rectangle((2, 2), (0, 0), (1, 1))
    mesh_f = mesh_c.refine()
    sc = FESpace(mesh_c, 2)
    sf = FESpace(mesh_f, 2)
    t = build_transfer(sc, sf, dtype=jnp.float64)

    rng = np.random.default_rng(0)
    u_c = jnp.asarray(rng.standard_normal((sc.n_nodes, 3)))
    r_f = jnp.asarray(rng.standard_normal((sf.n_nodes, 3)))
    # <P u_c, r_f> == <u_c, P^T r_f>
    lhs = float(jnp.vdot(prolongate(t, u_c), r_f))
    rhs = float(jnp.vdot(u_c, restrict(t, r_f)))
    assert np.isclose(lhs, rhs, rtol=1e-12)
