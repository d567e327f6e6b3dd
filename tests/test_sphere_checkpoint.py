"""Sphere case (Gmsh import + slip walls) e2e smoke + checkpoint/resume."""

import os

import numpy as np
import pytest

from ns_gls_tpu.config import Parameters
from ns_gls_tpu.utils import logging as nslog

nslog.set_verbose(False)

MESH = os.path.join(
    os.path.dirname(__file__), "..", "meshes", "sphere.msh"
)  # repo fixture (tools/make_sphere_fixture.py)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(MESH), reason="gmsh asset missing")
def test_sphere_case_steps(tmp_path):
    from ns_gls_tpu.driver import Driver

    # mirrors input_sphere_amg.json (stationary Newton, nu=0.1, AMG) at
    # Q1/refinement 0 so the CPU test stays small
    p = Parameters.from_dict(
        {
            "dim": 3,
            "fe degree": 1,
            "n global refinements": 0,
            "simulation name": "sphere",
            "time intration": "none",
            "c1": 1.0,
            "c2": 1.0,
            "nu": 0.1,
            "consider time derivative": True,
            "cell wise stabilization": False,
            "lin relative tolerance": 1e-2,
            "lin n max iterations": 100000,
            "preconditioner": "AMG",
            "nonlinear solver": "Newton",
            "output granularity": 0.0,
            "simulation mesh file": MESH,
        }
    )
    d = Driver(p)
    d.run(max_steps=1)
    u = np.asarray(d.solution.current)
    assert np.isfinite(u).all()
    # slip walls: n.u = 0 on boundary id 2
    nodes, normals = d.space.boundary_node_normals([2])
    flux = (u[nodes, :3] * normals).sum(axis=1)
    assert np.abs(flux).max() < 1e-9
    # no-slip on the sphere (id 0)
    assert np.abs(u[d.space.boundary_nodes([0]), :3]).max() < 1e-12


def test_checkpoint_roundtrip(tmp_path):
    from ns_gls_tpu.driver import Driver
    from ns_gls_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = {
        "dim": 2,
        "fe degree": 1,
        "n global refinements": 1,
        "simulation name": "channel",
        "cfl": 0.1,
        "t final": 1.0,
        "bdf order": 2,
        "time intration": "bdf",
        "c1": 2.0,
        "c2": 1.0,
        "nu": 0.01,
        "consider time derivative": True,
        "lin relative tolerance": 1e-2,
        "preconditioner": "GMG",
        "gmg coarse grid solver": "direct",
        "nonlinear solver": "Newton",
        "output granularity": 0.0,
    }
    d = Driver(Parameters.from_dict(cfg))
    d.run(max_steps=2)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, d, t=0.123, counter=3)

    d2 = Driver(Parameters.from_dict(cfg))
    d2.setup()
    t, counter = load_checkpoint(path, d2)
    assert t == 0.123 and counter == 3
    for a, b in zip(d.solution.vectors, d2.solution.vectors):
        assert np.allclose(np.asarray(a), np.asarray(b))
    assert np.isclose(d2.time_integrator.current_dt,
                      d.time_integrator.current_dt)


def test_kill_and_resume_matches_uninterrupted(tmp_path):
    """Driver-level checkpoint/resume e2e (VERDICT r1 #6): run 2 steps with
    rolling checkpoints, resume a fresh Driver from disk, run 2 more —
    the trajectory must match an uninterrupted 4-step run."""
    from ns_gls_tpu.driver import Driver

    cfg = {
        "dim": 2,
        "fe degree": 1,
        "n global refinements": 1,
        "simulation name": "channel",
        "cfl": 0.1,
        "t final": 1.0,
        "bdf order": 2,
        "time intration": "bdf",
        "c1": 2.0,
        "c2": 1.0,
        "nu": 0.01,
        "consider time derivative": True,
        "lin relative tolerance": 1e-4,
        "preconditioner": "GMG",
        "gmg coarse grid solver": "direct",
        "nonlinear solver": "Newton",
        "output granularity": 0.0,
        "checkpoint prefix": str(tmp_path / "ckpt"),
        "checkpoint granularity": 1e-9,  # every step
    }
    ref = Driver(Parameters.from_dict(dict(cfg, **{"checkpoint prefix": ""})))
    ref.run(max_steps=4)

    d1 = Driver(Parameters.from_dict(cfg))
    d1.run(max_steps=2)

    d2 = Driver(Parameters.from_dict(cfg))
    d2.run(max_steps=4, resume=True)  # cycles 3..4 (counter resumes at 3)

    a = np.asarray(ref.solution.current)
    b = np.asarray(d2.solution.current)
    assert np.allclose(a, b, atol=1e-12), np.abs(a - b).max()
