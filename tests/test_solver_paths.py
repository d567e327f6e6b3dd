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


def test_gmg_ilu_coarse():
    """Coarse solver \"ILU\" (``multigrid.cc:435-460``): host SuperLU ILU
    applied through pure_callback inside the jitted V-cycle."""
    d = run(
        {
            "preconditioner": "GMG",
            "gmg coarse grid solver": "ILU",
            "nonlinear solver": "Newton",
            "lin relative tolerance": 1e-4,
        },
        max_steps=2,
    )
    assert d.linear_solver.last_iterations < 40


def test_gmg_amg_coarse_tuned_parameters():
    """\"gmg coarse grid amg use default parameters\": false selects the
    tuned aggregation set (``multigrid.cc:398-433``)."""
    d = run(
        {
            "preconditioner": "GMG",
            "gmg coarse grid solver": "AMG",
            "gmg coarse grid iterate": True,
            "gmg coarse grid amg use default parameters": False,
            "nonlinear solver": "Newton",
            "lin relative tolerance": 1e-4,
        },
        max_steps=2,
    )
    assert d.linear_solver.last_iterations < 60


def test_iso_q1_element_tables():
    """FE_Q_iso_Q1 coarse element: partition of unity and exact
    reproduction of linear fields at the sub-cell quadrature points."""
    from ns_gls_tpu.fem.element import IsoQ1Element

    for dim in (2, 3):
        for deg in (2, 3):
            el = IsoQ1Element(dim, deg, deg + 1)
            S, D = el.tables
            assert S.shape == ((2 * deg) ** dim, (deg + 1) ** dim)
            np.testing.assert_allclose(S.sum(1), 1.0, atol=1e-13)
            np.testing.assert_allclose(D.sum(1), 0.0, atol=1e-12)
            # linear field u = a.x reproduced exactly (values + gradients)
            a = np.arange(1, dim + 1, dtype=float)
            u_nodes = el.support_points @ a
            np.testing.assert_allclose(S @ u_nodes, el.q_points @ a,
                                       atol=1e-13)
            np.testing.assert_allclose(
                np.einsum("qik,i->qk", D, u_nodes),
                np.tile(a, ((2 * deg) ** dim, 1)), atol=1e-12)
            # the sub-cell rule integrates piecewise-bilinear masses exactly:
            # total measure = 1
            np.testing.assert_allclose(el.q_weights.sum(), 1.0, atol=1e-13)


def test_gmg_fe_q_iso_q1_coarse():
    """GMG with the coarse level on FE_Q_iso_Q1 (sphere configs,
    \"gmg coarse grid use fe q iso q1\": true)."""
    d = run(
        {
            "fe degree": 2,
            "preconditioner": "GMG",
            "gmg coarse grid solver": "direct",
            "gmg coarse grid use fe q iso q1": True,
            "nonlinear solver": "Newton",
            "lin relative tolerance": 1e-4,
        },
        max_steps=2,
    )
    assert d.mg_spaces[0].iso_q1
    assert not d.mg_spaces[-1].iso_q1
    assert d.linear_solver.last_iterations < 40


def test_bench_helpers():
    import bench

    op, space, u = bench.build(dim=2, refinements=2, degree=1)
    sol = bench.roofline_seconds(op, space, u.dtype)
    assert sol > 0
    dt = bench.time_apply(op.vmult_pure, op.vmult_args, u, n_rep=3)
    assert dt > 0


def test_omega_reuse_preserves_solution():
    """NS_OMEGA_REFRESH=N reuses the power-method smoother damping for
    N-1 preconditioner rebuilds; the damping only shapes smoother
    convergence, so the converged time-stepped solution must agree with
    the per-rebuild refresh to solver tolerance."""
    import json
    import os

    import numpy as np

    from ns_gls_tpu.config import Parameters
    from ns_gls_tpu.driver import Driver
    from ns_gls_tpu.utils import logging as nslog

    nslog.set_verbose(False)
    cfg = json.load(open(os.path.join(
        os.path.dirname(__file__), "..", "input", "channel.json")))
    cfg["output granularity"] = 0.0
    cfg["paraview prefix"] = ""
    sols = {}
    for n in ("1", "4"):
        os.environ["NS_OMEGA_REFRESH"] = n
        try:
            d = Driver(Parameters.from_dict(cfg))
            d.run(max_steps=6)
            sols[n] = np.asarray(d.solution.current)
        finally:
            del os.environ["NS_OMEGA_REFRESH"]
    diff = (np.abs(sols["1"] - sols["4"]).max()
            / np.abs(sols["1"]).max())
    assert diff < 1e-6, diff
