"""Mesh engine tests: generators, refinement, manifolds, Turek geometry,
Gmsh import, SFC ordering."""

import os

import numpy as np
import pytest

from ns_gls_tpu.fem.space import FESpace
from ns_gls_tpu.mesh.cylinder import cylinder_mesh_2d, cylinder_mesh_3d
from ns_gls_tpu.mesh.core import PolarManifold
from ns_gls_tpu.mesh.generators import (
    hyper_cube_with_cylindrical_hole,
    hyper_shell_2d,
    subdivided_hyper_rectangle,
)


def test_rectangle_colorize():
    m = subdivided_hyper_rectangle((2, 3), (0, 0), (2, 3), colorize=True)
    bf = m.compute_boundary_faces()
    ids = m.boundary_ids[bf[:, 0], bf[:, 1]]
    counts = dict(zip(*np.unique(ids, return_counts=True)))
    assert counts == {0: 3, 1: 3, 2: 2, 3: 2}


def test_refinement_preserves_volume():
    m = subdivided_hyper_rectangle((2, 1, 1), (0, 0, 0), (2, 1, 1))
    m2 = m.refine_global(2)
    assert m2.n_cells == 2 * 64
    sp = FESpace(m2, 1)
    assert np.isclose(sp.jxw.sum(), 2.0)


def test_polar_refinement_snaps_to_circle():
    m = hyper_cube_with_cylindrical_hole(0.05, 0.1)
    m.manifolds[0] = PolarManifold((0.0, 0.0))
    m = m.refine_global(3)
    sp = FESpace(m, 2, 2)
    nodes = sp.boundary_nodes([0])  # all ids are 0 here; filter by radius
    r = np.linalg.norm(sp.node_pos[nodes], axis=1)
    on_circle = r[np.abs(r - 0.05) < 1e-3]
    assert np.allclose(on_circle, 0.05, atol=1e-12)


def test_turek_2d_geometry():
    m = cylinder_mesh_2d()
    assert m.n_cells == 88  # 9 merged patches, as in the reference
    bf = m.compute_boundary_faces()
    ids = m.boundary_ids[bf[:, 0], bf[:, 1]]
    counts = dict(zip(*np.unique(ids, return_counts=True)))
    assert counts[0] == 4 and counts[1] == 4 and counts[2] == 8
    sp = FESpace(m.refine_global(2), 2, 2)
    area = sp.jxw.sum()
    exact = 2.2 * 0.41 - np.pi * 0.05**2
    assert abs(area - exact) < 1e-6


def test_turek_3d_geometry():
    m = cylinder_mesh_3d()
    assert m.n_cells == 400
    sp = FESpace(m.refine_global(1), 2, 2)
    vol = sp.jxw.sum()
    exact = (2.5 * 0.41 - np.pi * 0.05**2) * 0.41
    assert abs(vol - exact) < 1e-5
    # z-extent centered
    assert np.isclose(m.vertices[:, 2].min(), -0.205)
    assert np.isclose(m.vertices[:, 2].max(), 0.205)


def test_hyper_shell():
    m = hyper_shell_2d((0, 0), 0.25, 1.0, 4)
    m.manifolds[0] = PolarManifold((0.0, 0.0))
    m = m.refine_global(3)
    sp = FESpace(m, 2, 2)
    area = sp.jxw.sum()
    exact = np.pi * (1.0**2 - 0.25**2)
    assert abs(area - exact) / exact < 2e-3  # quadratic boundary approx


def test_sfc_order_is_permutation():
    m = cylinder_mesh_2d().refine_global(1)
    perm = m.sfc_order()
    assert sorted(perm.tolist()) == list(range(m.n_cells))


def test_gmsh_reader():
    from ns_gls_tpu.mesh.gmsh import read_msh

    # repo fixture (tools/make_sphere_fixture.py)
    m = read_msh(os.path.join(os.path.dirname(__file__), "..", "meshes",
                              "sphere.msh"))
    assert m.n_cells == 48
    bf = m.compute_boundary_faces()
    ids = m.boundary_ids[bf[:, 0], bf[:, 1]]
    assert set(np.unique(ids)) == {0, 1, 2, 3}
    sp = FESpace(m, 1)
    assert (sp.jxw > 0).all()
