"""Cylinder ``rotate`` and ``distortion`` (roughness-study machinery,
reference ``simulation.cc:328-375``): the rotated polygonal cylinder is a
physically different geometry (the study's roughness-phase parameter), so
it must change the computed drag; distortion perturbs interior vertices
only, bounded by the local edge length."""

import numpy as np
import pytest

from ns_gls_tpu.models.cylinder import SimulationCylinder
from ns_gls_tpu.utils import logging as nslog

nslog.set_verbose(False)


def make_sim(rotate=False, distortion=0.0, reset=0):
    sim = SimulationCylinder(2)
    sim.rotate = rotate
    sim.distortion = distortion
    sim.reset_manifold_level = reset
    return sim


def test_rotate_vertex_semantics():
    m0 = make_sim(rotate=False).create_mesh(1)
    mr = make_sim(rotate=True).create_mesh(1)
    v0, vr = m0.vertices, mr.vertices
    assert v0.shape == vr.shape
    D = 0.1
    out_box = (np.abs(v0[:, 0]) > D) | (np.abs(v0[:, 1]) > D)
    # outside the |x|,|y| <= D box nothing moves
    assert np.allclose(vr[out_box], v0[out_box])
    assert not np.allclose(vr[~out_box], v0[~out_box])
    # vertices at the polygon chord radius rotate by exactly 0.2 rad
    r = np.linalg.norm(v0, axis=1)
    c = np.cos(np.pi / 8.0) * D / 2.0
    surf = np.abs(r - c) < 1e-12
    assert surf.any()
    dtheta = np.arctan2(vr[surf, 1], vr[surf, 0]) - np.arctan2(
        v0[surf, 1], v0[surf, 0]
    )
    dtheta = np.angle(np.exp(1j * dtheta))
    assert np.allclose(dtheta, 0.2, atol=1e-12)
    assert np.allclose(np.linalg.norm(vr[surf], axis=1), r[surf])
    # the whole GMG chain is deformed consistently (shared vertex prefix)
    assert mr.prev is not None
    n_prev = len(mr.prev.vertices)
    assert np.allclose(mr.prev.vertices, vr[:n_prev])


def test_distortion_vertex_semantics():
    m0 = make_sim(distortion=0.0).create_mesh(1)
    md = make_sim(distortion=0.2).create_mesh(1)
    v0, vd = m0.vertices, md.vertices
    moved = np.linalg.norm(vd - v0, axis=1)
    # boundary (channel walls, in/outflow, cylinder) vertices fixed
    from ns_gls_tpu.fem.element import cell_face_vertices

    on_bdy = np.zeros(len(v0), dtype=bool)
    fv = cell_face_vertices(2)
    for f in range(4):
        cb = m0.boundary_ids[:, f] >= 0
        if cb.any():
            on_bdy[m0.cells[cb][:, fv[f]].ravel()] = True
    assert np.allclose(moved[on_bdy], 0.0)
    assert (moved[~on_bdy] > 0).mean() > 0.9
    # bounded by factor x shortest incident edge
    from ns_gls_tpu.fem.element import cell_edge_vertices

    edges = np.asarray(cell_edge_vertices(2))
    a = m0.cells[:, edges[:, 0]].ravel()
    b = m0.cells[:, edges[:, 1]].ravel()
    ln = np.linalg.norm(v0[a] - v0[b], axis=1)
    min_len = np.full(len(v0), np.inf)
    np.minimum.at(min_len, a, ln)
    np.minimum.at(min_len, b, ln)
    assert (moved <= 0.2 * min_len + 1e-14).all()


@pytest.mark.slow
def test_rotate_changes_drag():
    """The roughness-phase effect: same polygonal cylinder, rotated ->
    different drag (stationary Re20-style solve, coarse)."""
    from ns_gls_tpu.config import Parameters
    from ns_gls_tpu.driver import Driver

    def drag(rotate):
        base = {
            "dim": 2,
            "fe degree": 1,
            "mapping degree": 1,
            "n global refinements": 1,
            "time intration": "none",
            "c1": 2.0,
            "c2": 1.0,
            "nu": 0.01,
            "consider time derivative": False,
            "lin relative tolerance": 1e-4,
            "preconditioner": "GMG",
            "gmg coarse grid solver": "direct",
            "nonlinear solver": "Newton",
            "nonlinear tolerance": 1e-8,
            "output granularity": 0.0,
            "simulation name": "cylinder",
            "simulation rotate": rotate,
            "simulation reset manifold level": 0,
            "simulation u max": 0.3,
        }
        d = Driver(Parameters.from_dict(base))
        recs = d.run(max_steps=1)
        return recs[-1]["drag"]

    d0, dr = drag(False), drag(True)
    assert np.isfinite(d0) and np.isfinite(dr)
    assert abs(d0 - dr) > 1e-4 * abs(d0)
