"""Patch-lattice 3D Pallas fast path (ops/patch3d.py) must match the
general fused sweep exactly on general non-extruded 3D meshes — the
Gmsh sphere family (reference ``simulation.cc:852-908``).  Closes
``do_vmult_cell`` (operator_ns.cc:949-1182) fast-path parity on the one
mesh family the structured/prism/patch2d kernels don't cover."""

import jax.numpy as jnp
import numpy as np
import pytest

from ns_gls_tpu.fem.constraints import AffineConstraints, distribute
from ns_gls_tpu.fem.space import FESpace
from ns_gls_tpu.mesh.generators import extrude, subdivided_hyper_rectangle
from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
from ns_gls_tpu.ops.time_integration import BDFIntegrator, SolutionHistory


def general3d_mesh(nx=2, ny=2, n_refine=1):
    """General 3D mesh with a refinement chain and NO extrusion metadata
    (extr_mesh2d stripped), so the prism path cannot claim it."""
    import dataclasses

    m2 = subdivided_hyper_rectangle((nx, ny), (0.0, 0.0), (1.1, 0.9))
    m2.lattice = None
    mesh = extrude(m2, 2, 0.7)
    mesh = dataclasses.replace(mesh, extr_mesh2d=None, extr_cell2d=None,
                               extr_layer=None)
    for _ in range(n_refine):
        mesh = mesh.refine()
    return mesh


def make_pair(mesh, degree, increment, cell_wise):
    space = FESpace(mesh, degree)
    assert space.patch3d and not space.prism and not space.structured
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

    ops = []
    for use_s in (False, True):
        op = NavierStokesOperator(
            space, ca, ca, nu=0.02, c_1=4.0, c_2=2.0,
            time_integrator=ti, consider_time_derivative=True,
            increment_form=increment, cell_wise_stabilization=cell_wise,
            fuse_tables=True, dtype=jnp.float32, use_structured=use_s,
        )
        op.constraints_inhomogeneous = ca
        ops.append(op)
    assert ops[0]._p3sweep is None and ops[1]._p3sweep is not None

    rng = np.random.default_rng(0)
    u = distribute(
        ca, jnp.asarray(rng.standard_normal((space.n_nodes, C)), jnp.float32)
    )
    hist = SolutionHistory(
        [u]
        + [jnp.asarray(rng.standard_normal((space.n_nodes, C)), jnp.float32)
           for _ in range(2)]
    )
    for op in ops:
        op.set_previous_solution(hist)
        op.set_linearization_point(u)
    return ops, space, u


def check(mesh, degree, increment, cell_wise, tol=5e-6):
    (op_g, op_p), space, u = make_pair(mesh, degree, increment, cell_wise)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal(u.shape), jnp.float32)
    a = np.asarray(op_g.vmult(v))
    s = np.asarray(op_p.vmult(v))
    assert np.abs(a - s).max() <= tol * np.abs(a).max(), \
        np.abs(a - s).max() / np.abs(a).max()
    ra = np.asarray(op_g.evaluate_residual(u))
    rs = np.asarray(op_p.evaluate_residual(u))
    assert np.abs(ra - rs).max() <= tol * np.abs(ra).max(), \
        np.abs(ra - rs).max() / np.abs(ra).max()


@pytest.mark.parametrize("increment,cell_wise", [
    (False, True), (True, False), (True, True),
])
def test_patch3d_q1(increment, cell_wise):
    check(general3d_mesh(), 1, increment, cell_wise)


@pytest.mark.slow
def test_patch3d_q2():
    check(general3d_mesh(n_refine=1), 2, True, True)


def test_patch3d_single_cell_patches():
    check(general3d_mesh(nx=2, ny=2, n_refine=0), 1, True, False)


@pytest.mark.slow
def test_patch3d_sphere():
    """The actual target: the Gmsh sphere mesh (curved spherical
    manifold, valence-irregular vertices)."""
    from ns_gls_tpu.mesh.gmsh import read_msh

    mesh = read_msh("meshes/sphere.msh").refine_global(1)
    check(mesh, 1, True, False)
