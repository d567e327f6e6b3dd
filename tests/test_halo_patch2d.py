"""Distributed patch-2D fast path (parallel/halo_patch2d.py): the
patch-lattice Pallas kernel running as the halo local sweep must match
the unsharded operator exactly — vmult, residual — on general 2D meshes
with the patch partition.  Completes the matrix-free + distributed hot
kernel (``operator_ns.cc:702-717``) on the 2D mesh family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_gls_tpu.fem.constraints import AffineConstraints, distribute
from ns_gls_tpu.fem.space import FESpace
from ns_gls_tpu.mesh.generators import subdivided_hyper_rectangle
from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
from ns_gls_tpu.ops.time_integration import BDFIntegrator, SolutionHistory


def _mesh8():
    from ns_gls_tpu.parallel.sharding import make_device_mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_device_mesh(devs[:8])


def mb_mesh(nx=4, ny=3, n_refine=2):
    m = subdivided_hyper_rectangle((nx, ny), (0.0, 0.0), (1.1, 0.9))
    m.lattice = None
    for _ in range(n_refine):
        m = m.refine()
    return m


def make_op(mesh, degree=1, increment=True, cell_wise=False):
    space = FESpace(mesh, degree)
    assert space.patch2d
    dim = 2
    C = dim + 1
    b = AffineConstraints(space.n_nodes, C)
    bn = space.boundary_nodes([0])
    b.add_dirichlet(bn, list(range(dim)), values=[[1.0, 0.0]] * len(bn))
    walls = space.boundary_nodes([2, 3])
    b.add_dirichlet(walls, list(range(dim)))
    ca = b.close()
    ti = BDFIntegrator(2)
    ti.update_dt(0.1)
    ti.update_dt(0.08)
    op = NavierStokesOperator(
        space, ca, ca, nu=0.02, c_1=4.0, c_2=2.0,
        time_integrator=ti, consider_time_derivative=True,
        increment_form=increment, cell_wise_stabilization=cell_wise,
        fuse_tables=True, dtype=jnp.float32, use_structured=True,
    )
    assert op._p2sweep is not None, "patch2d fast path not engaged"
    op.constraints_inhomogeneous = ca
    rng = np.random.default_rng(0)
    u = distribute(
        ca, jnp.asarray(rng.standard_normal((space.n_nodes, C)), jnp.float32)
    )
    hist = SolutionHistory(
        [u]
        + [jnp.asarray(rng.standard_normal((space.n_nodes, C)), jnp.float32)
           for _ in range(2)]
    )
    op.set_previous_solution(hist)
    op.set_linearization_point(u)
    return op, space, u


def check_parity(mesh_geom, degree=1, increment=True, cell_wise=False,
                 tol=2e-5):
    from ns_gls_tpu.parallel.halo import HaloShardedOperator

    dmesh = _mesh8()
    op, space, u = make_op(mesh_geom, degree, increment, cell_wise)
    halo = HaloShardedOperator(op, dmesh)
    assert halo._halo_patch2 is not None, \
        "distributed patch2d fast path not engaged"

    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal(u.shape), jnp.float32)
    a = np.asarray(op.vmult(v))
    h = np.asarray(halo.vmult(v))
    assert np.abs(a - h).max() <= tol * np.abs(a).max(), \
        np.abs(a - h).max() / np.abs(a).max()
    ra = np.asarray(op.evaluate_residual(u))
    rh = np.asarray(halo.evaluate_residual(u))
    assert np.abs(ra - rh).max() <= tol * max(np.abs(ra).max(), 1e-3)
    # a second linearization point must invalidate the cached planes
    u2 = distribute(op.constraints_inhomogeneous, 1.3 * u)
    op.set_linearization_point(u2)
    halo.set_linearization_point(u2)
    ra = np.asarray(op.evaluate_residual(u2))
    rh = np.asarray(halo.evaluate_residual(u2))
    assert np.abs(ra - rh).max() <= tol * max(np.abs(ra).max(), 1e-3)
    return halo


def test_halo_patch2d_increment():
    check_parity(mb_mesh())


def test_halo_patch2d_fixedpoint_cellwise():
    check_parity(mb_mesh(), increment=False, cell_wise=True)


def test_halo_patch2d_q2():
    check_parity(mb_mesh(nx=3, ny=3, n_refine=1), degree=2)


def test_halo_patch2d_turek2d():
    """The target geometry: the curved Turek 2D mesh."""
    from ns_gls_tpu.mesh.cylinder import cylinder_mesh_2d

    check_parity(cylinder_mesh_2d().refine_global(1))


def test_halo_patch2d_off_switch(monkeypatch):
    """NS_HALO_PATCH2D=0 falls back to the general halo sweep with
    identical results."""
    from ns_gls_tpu.parallel.halo import HaloShardedOperator

    dmesh = _mesh8()
    op, space, u = make_op(mb_mesh())
    halo_p = HaloShardedOperator(op, dmesh)
    monkeypatch.setenv("NS_HALO_PATCH2D", "0")
    halo_g = HaloShardedOperator(op, dmesh)
    assert halo_p._halo_patch2 is not None and halo_g._halo_patch2 is None
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal(u.shape), jnp.float32)
    a = np.asarray(halo_p.vmult(v))
    b = np.asarray(halo_g.vmult(v))
    assert np.abs(a - b).max() <= 2e-5 * np.abs(a).max()
