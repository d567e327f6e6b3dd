"""Distributed patch-3D fast path (parallel/halo_patch3d.py): the 3D
patch-lattice Pallas kernel running as the halo local sweep must match
the unsharded operator exactly on general non-extruded 3D meshes
(``operator_ns.cc:702-717``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_gls_tpu.fem.constraints import AffineConstraints, distribute
from ns_gls_tpu.fem.space import FESpace
from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
from ns_gls_tpu.ops.time_integration import BDFIntegrator, SolutionHistory


def _mesh8():
    from ns_gls_tpu.parallel.sharding import make_device_mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_device_mesh(devs[:8])


def g3_mesh(nx=4, ny=3, n_refine=1):
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_patch3d import general3d_mesh

    return general3d_mesh(nx, ny, n_refine)


def make_op(mesh, degree=1, increment=True, cell_wise=False):
    space = FESpace(mesh, degree)
    assert space.patch3d
    dim = 3
    C = dim + 1
    b = AffineConstraints(space.n_nodes, C)
    bn = space.boundary_nodes([0])
    b.add_dirichlet(bn, list(range(dim)),
                    values=[[1.0, 0.0, 0.0]] * len(bn))
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
    assert op._p3sweep is not None
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
    assert halo._halo_patch3 is not None, \
        "distributed patch3d fast path not engaged"
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal(u.shape), jnp.float32)
    a = np.asarray(op.vmult(v))
    h = np.asarray(halo.vmult(v))
    assert np.abs(a - h).max() <= tol * np.abs(a).max(), \
        np.abs(a - h).max() / np.abs(a).max()
    ra = np.asarray(op.evaluate_residual(u))
    rh = np.asarray(halo.evaluate_residual(u))
    assert np.abs(ra - rh).max() <= tol * max(np.abs(ra).max(), 1e-3)
    u2 = distribute(op.constraints_inhomogeneous, 1.3 * u)
    op.set_linearization_point(u2)
    halo.set_linearization_point(u2)
    ra = np.asarray(op.evaluate_residual(u2))
    rh = np.asarray(halo.evaluate_residual(u2))
    assert np.abs(ra - rh).max() <= tol * max(np.abs(ra).max(), 1e-3)


def test_halo_patch3d_increment():
    check_parity(g3_mesh())


def test_halo_patch3d_fixedpoint_cellwise():
    check_parity(g3_mesh(), increment=False, cell_wise=True)


@pytest.mark.slow
def test_halo_patch3d_sphere():
    """The target geometry: the Gmsh sphere mesh."""
    from ns_gls_tpu.mesh.gmsh import read_msh

    check_parity(read_msh("meshes/sphere.msh").refine_global(1))
