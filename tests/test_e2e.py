"""End-to-end integration tests (SURVEY §4: the reference validates through
physics benchmarks; these are the automated versions).

Kept small so CPU jit-compile time stays tolerable; the full-resolution
corridor checks run on TPU via the driver (see BASELINE.md targets).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ns_gls_tpu.config import Parameters
from ns_gls_tpu.utils import logging as nslog

nslog.set_verbose(False)


def run_driver(overrides, max_steps=10**9):
    from ns_gls_tpu.driver import Driver

    base = {
        "dim": 2,
        "fe degree": 1,
        "mapping degree": 0,
        "n global refinements": 1,
        "cfl": 0.1,
        "t final": 0.1,
        "bdf order": 1,
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
    base.update(overrides)
    d = Driver(Parameters.from_dict(base))
    recs = d.run(max_steps=max_steps)
    return d, recs


def test_channel_newton_gmg():
    d, _ = run_driver({"simulation name": "channel"}, max_steps=2)
    u = np.asarray(d.solution.current)
    assert np.isfinite(u).all()
    # inflow BC enforced (excluding corner nodes, where the wall no-slip
    # constraint takes precedence — first-added wins, like the reference's
    # constraint build order)
    inflow = d.space.boundary_nodes([0])
    walls = set(d.space.boundary_nodes([2, 3]).tolist())
    interior_inflow = np.array([n for n in inflow if n not in walls])
    assert np.allclose(u[interior_inflow, 0], 1.0)
    assert np.allclose(u[interior_inflow, 1], 0.0)
    # walls no-slip
    assert np.allclose(u[d.space.boundary_nodes([2, 3]), :2], 0.0)
    # pressure pinned at outflow
    outflow = d.space.boundary_nodes([1])
    assert np.allclose(u[outflow, 2], 0.0)


def test_channel_picard_jacobi():
    d, _ = run_driver(
        {
            "simulation name": "channel",
            "nonlinear solver": "Picard",
            "preconditioner": "ILU",  # round-1: Jacobi stand-in
            "lin relative tolerance": 1e-6,
            "n global refinements": 0,
        },
        max_steps=1,
    )
    assert np.isfinite(np.asarray(d.solution.current)).all()


def test_channel_linearized():
    d, _ = run_driver(
        {"simulation name": "channel", "nonlinear solver": "linearized"},
        max_steps=2,
    )
    assert np.isfinite(np.asarray(d.solution.current)).all()


def test_channel_matrix_based_operator():
    """`use matrix free ns operator: false` — assembled-SpMV fallback
    (reference ``main.cc:351-364``), cross-checked against the matrix-free
    run."""
    common = {
        "simulation name": "channel",
        "nonlinear solver": "linearized",
        "lin relative tolerance": 1e-10,
        "n global refinements": 0,
    }
    d_mb, _ = run_driver(dict(common, **{"use matrix free ns operator": False}),
                         max_steps=2)
    d_mf, _ = run_driver(common, max_steps=2)
    a = np.asarray(d_mb.solution.current)
    b = np.asarray(d_mf.solution.current)
    assert np.allclose(a, b, atol=1e-7), np.abs(a - b).max()


def test_channel_theta_scheme():
    d, _ = run_driver(
        {
            "simulation name": "channel",
            "time intration": "theta",
            "theta": 0.5,
            "nonlinear solver": "Picard",
            "consider time derivative": False,
            # Picard iterates to 1e-7 absolute: the inner solves must go
            # below that, so use an f64 preconditioner (the f32 MG V-cycle
            # floors the achievable linear residual at ~1e-7*||b||)
            "lin relative tolerance": 1e-12,
            "preconditioner": "ILU",
            "cfl": 0.05,
        },
        max_steps=2,
    )
    assert np.isfinite(np.asarray(d.solution.current)).all()


@pytest.mark.slow
def test_turek_2d_re20_stationary():
    """Schäfer-Turek 2D-1 at a coarse level: values must sit near the
    published corridor (drag 5.5795, lift 0.0106, dp 0.1175); at
    refinement 1 with Q2 we accept a few-percent discretization gap."""
    d, recs = run_driver(
        {
            "simulation name": "cylinder",
            "fe degree": 2,
            "n global refinements": 1,
            "time intration": "none",
            "c1": 1.0,
            "c2": 1.0,
            "nu": 0.001,
            "cell wise stabilization": False,
            "lin n max iterations": 100000,
            "simulation u max": 0.3,
            "simulation t init": 0.0,
        }
    )
    rec = recs[-1]
    assert 5.2 < rec["drag"] < 5.9, rec
    assert -0.05 < rec["lift"] < 0.08, rec
    assert 0.10 < rec["p_diff"] < 0.135, rec
