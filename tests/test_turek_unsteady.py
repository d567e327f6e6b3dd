"""Schäfer-Turek 2D-2 (Re100, unsteady vortex shedding) corridor check.

Published benchmark values (Schäfer & Turek 1996, lower/upper corridors):
c_D,max in [3.22, 3.24], c_L,max in [0.99, 1.01], Strouhal in
[0.295, 0.305]. At the default refinement 2 with Q2 the discretization
gap widens the acceptance windows (calibrated against this framework's
own converged series, validation/turek_2d_re100_ref2_q2_series.json);
run with NS_CORRIDOR_REF=4 for near-published corridors.

Cost: thousands of BDF-2 steps through shedding onset (~35 min on one
CPU core after the round-3 dispatch fusions), kept opt-in via
NS_CORRIDOR=1 — e.g.
    NS_CORRIDOR=1 python -m pytest tests/test_turek_unsteady.py -m slow
Reference: ``simulation.cc:433-640`` + ``input/input_turek_2D_Re100.json``.
"""

import json
import os

import numpy as np
import pytest

from ns_gls_tpu.config import Parameters
from ns_gls_tpu.utils import logging as nslog

nslog.set_verbose(False)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("NS_CORRIDOR") != "1",
        reason="multi-hour corridor run; set NS_CORRIDOR=1 to enable",
    ),
]


def shedding_stats(recs, t_tail=8.0):
    t = np.array([r["t"] for r in recs])
    drag = np.array([r["drag"] for r in recs])
    lift = np.array([r["lift"] for r in recs])
    m = t > t[-1] - t_tail
    tt, ll = t[m], lift[m]
    up = tt[1:][(ll[:-1] < 0) & (ll[1:] >= 0)]   # upward zero crossings
    period = float(np.diff(up).mean()) if len(up) > 2 else np.nan
    return {
        "drag_max": float(drag[m].max()),
        "lift_max": float(lift[m].max()),
        "lift_min": float(lift[m].min()),
        "strouhal": 0.1 * 1.0 / period,           # D=0.1, U_mean=1.0
    }


def test_turek_2d2_re100_corridor():
    from ns_gls_tpu.driver import Driver

    ref = int(os.environ.get("NS_CORRIDOR_REF", "2"))
    p = Parameters.from_dict({
        "dim": 2, "fe degree": 2, "mapping degree": 0,
        "n global refinements": ref, "simulation name": "cylinder",
        "cfl": 1.0, "t final": 35.0, "bdf order": 2,
        "time intration": "bdf",
        "c1": 2.0, "c2": 1.0, "nu": 0.001,
        "consider time derivative": True,
        "cell wise stabilization": False,
        "lin relative tolerance": 1e-2, "preconditioner": "GMG",
        "gmg coarse grid solver": "direct",
        "gmg coarse grid iterate": False,
        "nonlinear solver": "Newton", "newton inexact": True,
        "output granularity": 0.0,
        "simulation no slip cylinder": True,
        "simulation no slip wall": True,
        "simulation geometry cylinder shift": 0.005,
        "simulation t init": 0.01, "simulation u max": 1.5,
    })
    d = Driver(p)
    recs = d.run()
    s = shedding_stats(recs)
    out = f"/tmp/turek_2d2_corridor_ref{ref}.json"
    json.dump(s, open(out, "w"))

    if ref >= 4:
        # published corridors (Schäfer-Turek 1996)
        assert 3.21 < s["drag_max"] < 3.25, s
        assert 0.94 < s["lift_max"] < 1.06, s
        assert 0.29 < s["strouhal"] < 0.31, s
    else:
        # ref-2 Q2 windows calibrated against the stored converged series
        # (validation/turek_2d_re100_ref2_q2_series.json: drag_max 3.212,
        # lift in [-1.079, 1.041], Strouhal 0.2960, dp in [2.42, 2.52] —
        # St and dp inside the published corridors already at ref 2)
        assert 3.12 < s["drag_max"] < 3.32, s
        assert 0.90 < s["lift_max"] < 1.18, s
        assert 0.286 < s["strouhal"] < 0.306, s
    # shedding must actually be developed: alternating lift
    assert s["lift_min"] < -0.85, s
