"""Halo-exchange structured operator (parallel/structured_sharded.py):
z-partitioned node storage with ppermute plane exchange must match the
single-device fused sweep, and its per-apply collective traffic must be
O(halo) — two plane permutes — not O(N).

Reference behavior: partitioned vectors + ghost update/compress
(``operator_ns.cc:260,346,634-639``; ``main.cc:265-266``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_gls_tpu.fem.constraints import AffineConstraints
from ns_gls_tpu.fem.space import FESpace
from ns_gls_tpu.mesh.generators import subdivided_hyper_rectangle
from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
from ns_gls_tpu.ops.time_integration import BDFIntegrator, SolutionHistory

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def make_op(dim, degree, n_last=8):
    shape = (3, n_last) if dim == 2 else (2, 2, n_last)
    ext = (1.2, 2.0) if dim == 2 else (0.8, 0.9, 2.0)
    mesh = subdivided_hyper_rectangle(shape, (0.0,) * dim, ext,
                                      colorize=True)
    space = FESpace(mesh, degree)
    C = dim + 1
    ca = AffineConstraints(space.n_nodes, C).close(jnp.float32)
    ti = BDFIntegrator(2)
    ti.update_dt(0.1)
    ti.update_dt(0.08)
    op = NavierStokesOperator(
        space, ca, ca, nu=0.02, c_1=4.0, c_2=2.0,
        time_integrator=ti, consider_time_derivative=True,
        increment_form=False, cell_wise_stabilization=False,
        fuse_tables=True, dtype=jnp.float32, use_structured=True,
    )
    op.constraints_inhomogeneous = ca
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((space.n_nodes, C)), jnp.float32)
    hist = SolutionHistory([u, u * 0.9, u * 0.8])
    op.set_previous_solution(hist)
    op.set_linearization_point(u)
    return op, space, u


@needs_8
@pytest.mark.parametrize("dim,degree,flavor", [
    (2, 1, "fixed"), (2, 2, "residual"), (3, 1, "fixed"),
])
def test_halo_matches_single_device(dim, degree, flavor):
    from jax.sharding import Mesh

    from ns_gls_tpu.parallel.structured_sharded import (
        StructuredShardedOperator,
    )

    op, space, u = make_op(dim, degree)
    sw = op._ssweep
    tab = op._structured_tables
    st = op.state
    C = dim + 1
    shp = sw.lattice_shape
    uT = u.T.reshape((C,) + shp)

    ref = sw.apply(tab, st.weight, st.stau, uT, st.u_linT, st.vec_oldT,
                   flavor)

    mesh = Mesh(np.array(jax.devices()[:8]), ("z",))
    sop = StructuredShardedOperator(op, mesh)
    u_d = sop.scatter(uT)
    ul_d = sop.scatter(st.u_linT)
    vo_d = sop.scatter(st.vec_oldT)
    out = sop.gather_global(sop.apply(st.weight, st.stau, u_d, ul_d, vo_d,
                                      flavor))
    a, b = np.asarray(ref), np.asarray(out)
    assert np.abs(a - b).max() <= 1e-5 * np.abs(a).max(), \
        np.abs(a - b).max() / np.abs(a).max()

    # masked dot == global dot (shared planes counted once)
    va = sop.scatter(ref)
    got = float(sop.dot(va, va))
    want = float(jnp.sum(ref * ref))
    assert abs(got - want) <= 1e-4 * abs(want)


@needs_8
def test_halo_collective_volume_is_o_halo():
    """The compiled apply must move only plane-sized collective permutes —
    no O(N) all-reduce like the replicated-DoF path."""
    from jax.sharding import Mesh

    from ns_gls_tpu.parallel.structured_sharded import (
        StructuredShardedOperator,
    )

    op, space, u = make_op(2, 1, n_last=8)
    sw = op._ssweep
    st = op.state
    C = 3
    uT = u.T.reshape((C,) + sw.lattice_shape)
    mesh = Mesh(np.array(jax.devices()[:8]), ("z",))
    sop = StructuredShardedOperator(op, mesh)
    u_d = sop.scatter(uT)
    ul_d = sop.scatter(st.u_linT)
    vo_d = sop.scatter(st.vec_oldT)

    lowered = jax.jit(
        lambda *a: sop._apply["fixed"](sop.tables, st.weight, st.stau, *a)
    ).lower(u_d, ul_d, vo_d)
    hlo = lowered.as_text()
    assert hlo.count("collective_permute") == 2     # one per direction
    assert "all_reduce" not in hlo and "all_gather" not in hlo
