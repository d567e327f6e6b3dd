"""Distributed (halo-layout) MG transfer parity: HaloTransferOps must
reproduce the replicated prolongate/restrict exactly (same weights, same
sums — only the layout and the communication pattern differ)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_gls_tpu.fem import transfer as tr
from ns_gls_tpu.fem.constraints import AffineConstraints
from ns_gls_tpu.fem.space import FESpace
from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
from ns_gls_tpu.ops.time_integration import BDFIntegrator

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _op(space, dtype=jnp.float32):
    C = space.dim + 1
    ca = AffineConstraints(space.n_nodes, C).close(dtype)
    ti = BDFIntegrator(1)
    ti.update_dt(0.1)
    op = NavierStokesOperator(
        space, ca, ca, nu=0.01, c_1=2.0, c_2=1.0,
        time_integrator=ti, consider_time_derivative=True,
        increment_form=True, cell_wise_stabilization=False, dtype=dtype,
    )
    op.constraints_inhomogeneous = ca
    op.set_linearization_point(jnp.zeros((space.n_nodes, C), dtype))
    return op


@needs_8
@pytest.mark.parametrize("mesh_kind", ["quad", "turek"])
def test_halo_transfer_matches_replicated(mesh_kind):
    from ns_gls_tpu.parallel.halo import HaloShardedOperator, HaloTransferOps
    from ns_gls_tpu.parallel.sharding import make_device_mesh

    if mesh_kind == "quad":
        from ns_gls_tpu.mesh.generators import subdivided_hyper_rectangle

        coarse_mesh = subdivided_hyper_rectangle(
            [2, 2], [0.0, 0.0], [1.0, 1.0]
        ).refine_global(2)
    else:
        from ns_gls_tpu.mesh.cylinder import cylinder_mesh_2d

        coarse_mesh = cylinder_mesh_2d().refine_global(0)
    fine_mesh = coarse_mesh.refine_global(1)
    sc = FESpace(coarse_mesh, 1)
    sf = FESpace(fine_mesh, 1)
    t = tr.build_transfer(sc, sf, jnp.float32)

    mesh = make_device_mesh(jax.devices()[:8])
    hc = HaloShardedOperator(_op(sc), mesh)
    hf = HaloShardedOperator(_op(sf), mesh)
    ht = HaloTransferOps(t, hc, hf)

    rng = np.random.default_rng(3)
    C = sc.dim + 1
    uc = jnp.asarray(rng.standard_normal((sc.n_nodes, C)), jnp.float32)
    rf = jnp.asarray(rng.standard_normal((sf.n_nodes, C)), jnp.float32)

    # prolongation
    want = np.asarray(tr.prolongate(t, uc))
    got = np.asarray(
        hf.to_global(ht.prolongate_pure(ht.args, hc.to_dist(uc)))
    )
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()

    # restriction (transpose)
    want_r = np.asarray(tr.restrict(t, rf))
    got_r = np.asarray(
        hc.to_global(ht.restrict_pure(ht.args, hf.to_dist(rf)))
    )
    assert np.allclose(got_r, want_r, atol=1e-5), np.abs(got_r - want_r).max()
