"""Distributed prism fast path (parallel/halo_prism.py): the Pallas
extrusion kernel running as the halo local sweep must match the
unsharded operator exactly — vmult, residual, rhs — on extruded meshes,
with the patch partition keeping whole z-columns per device.  This is
the TPU answer to the reference's simultaneous matrix-free + MPI hot
kernel (``operator_ns.cc:702-717``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_gls_tpu.fem.constraints import AffineConstraints, distribute
from ns_gls_tpu.fem.space import FESpace
from ns_gls_tpu.mesh.generators import extrude, subdivided_hyper_rectangle
from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
from ns_gls_tpu.ops.time_integration import BDFIntegrator, SolutionHistory


def _mesh8():
    from ns_gls_tpu.parallel.sharding import make_device_mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_device_mesh(devs[:8])


def prism_mesh(nx=4, ny=3, n_refine=1):
    m2 = subdivided_hyper_rectangle((nx, ny), (0.0, 0.0), (1.1, 0.9))
    m2.lattice = None  # force the prism (not lattice) path
    mesh = extrude(m2, 2, 0.7)
    for _ in range(n_refine):
        mesh = mesh.refine()
    return mesh


def make_op(mesh, degree=1, increment=True, cell_wise=False):
    space = FESpace(mesh, degree)
    assert space.prism
    dim = 3
    C = dim + 1
    b = AffineConstraints(space.n_nodes, C)
    bn = space.boundary_nodes([0])
    b.add_dirichlet(bn, list(range(dim)),
                    values=[[1.0, 0.0, 0.0]] * len(bn))
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
    assert op._psweep is not None, "prism fast path not engaged"
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
    assert halo._halo_prism is not None, \
        "distributed prism fast path not engaged"

    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal(u.shape), jnp.float32)
    a = np.asarray(op.vmult(v))
    h = np.asarray(halo.vmult(v))
    assert np.abs(a - h).max() <= tol * np.abs(a).max(), \
        np.abs(a - h).max() / np.abs(a).max()
    ra = np.asarray(op.evaluate_residual(u))
    rh = np.asarray(halo.evaluate_residual(u))
    assert np.abs(ra - rh).max() <= tol * max(np.abs(ra).max(), 1e-3), \
        np.abs(ra - rh).max() / np.abs(ra).max()
    # a second linearization point must invalidate the cached planes
    u2 = distribute(op.constraints_inhomogeneous, 1.3 * u)
    op.set_linearization_point(u2)
    halo.set_linearization_point(u2)
    ra = np.asarray(op.evaluate_residual(u2))
    rh = np.asarray(halo.evaluate_residual(u2))
    assert np.abs(ra - rh).max() <= tol * max(np.abs(ra).max(), 1e-3)
    return halo


def test_halo_prism_increment():
    check_parity(prism_mesh())


def test_halo_prism_fixedpoint_cellwise():
    check_parity(prism_mesh(), increment=False, cell_wise=True)


def test_halo_prism_q2():
    check_parity(prism_mesh(nx=3, ny=3, n_refine=1), degree=2)


def test_halo_prism_turek3d():
    """The flagship geometry: extruded Turek cylinder (whole columns per
    device around the curved manifold)."""
    from ns_gls_tpu.mesh.cylinder import cylinder_mesh_3d

    halo = check_parity(cylinder_mesh_3d())
    # the partition is by patch: every device's window columns are full
    assert halo._prism_sweep is not None


def test_halo_prism_off_switch(monkeypatch):
    """NS_HALO_PRISM=0 falls back to the general sweep with identical
    results (the fallback the bench harness relies on)."""
    from ns_gls_tpu.parallel.halo import HaloShardedOperator

    dmesh = _mesh8()
    op, space, u = make_op(prism_mesh())
    halo_p = HaloShardedOperator(op, dmesh)
    monkeypatch.setenv("NS_HALO_PRISM", "0")
    halo_g = HaloShardedOperator(op, dmesh)
    assert halo_p._halo_prism is not None and halo_g._halo_prism is None
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal(u.shape), jnp.float32)
    a = np.asarray(halo_p.vmult(v))
    b = np.asarray(halo_g.vmult(v))
    assert np.abs(a - b).max() <= 2e-5 * np.abs(a).max()
