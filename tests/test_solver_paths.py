"""Coverage for the remaining solver-path combinations of the reference:
Richardson linear solver, iterative coarse-grid GMRES, direct linear
solver, and the bench harness helpers."""

import numpy as np
import pytest

from ns_gls_tpu.config import Parameters
from ns_gls_tpu.utils import logging as nslog

nslog.set_verbose(False)

BASE = {
    "dim": 2,
    "fe degree": 1,
    "n global refinements": 1,
    "simulation name": "channel",
    "cfl": 0.1,
    "t final": 0.1,
    "bdf order": 1,
    "time intration": "bdf",
    "nu": 0.01,
    "consider time derivative": True,
    "output granularity": 0.0,
}


def run(overrides, max_steps=1):
    from ns_gls_tpu.driver import Driver

    d = Driver(Parameters.from_dict(BASE | overrides))
    d.run(max_steps=max_steps)
    u = np.asarray(d.solution.current)
    assert np.isfinite(u).all()
    return d


def test_richardson_gmg():
    run(
        {
            "linear solver": "Richardson",
            "preconditioner": "GMG",
            "gmg coarse grid solver": "direct",
            "nonlinear solver": "linearized",
            "lin relative tolerance": 1e-6,
            "lin n max iterations": 2000,
        }
    )


def test_direct_linear_solver():
    run(
        {
            "linear solver": "direct",
            "preconditioner": "GMG",  # unused by 'direct'
            "nonlinear solver": "linearized",
            "n global refinements": 0,
        }
    )


def test_gmg_iterative_coarse():
    d = run(
        {
            "preconditioner": "GMG",
            "gmg coarse grid solver": "direct",
            "gmg coarse grid iterate": True,
            "gmg coarse grid gmres reltol": 1e-2,
            "nonlinear solver": "Newton",
            "lin relative tolerance": 1e-4,
        },
        max_steps=2,
    )
    assert d.linear_solver.last_iterations < 40


def test_bench_helpers():
    import bench

    op, space, u = bench.build(dim=2, refinements=2, degree=1)
    sol = bench.roofline_seconds(op, space, u.dtype)
    assert sol > 0
    dt = bench.time_apply(op.vmult_pure, op.vmult_args, u, n_rep=3)
    assert dt > 0
