"""Re 3900 wake-statistics check (Kravchenko & Moin, Phys. Fluids 12(2),
2000 — the reference's only quantitative target beyond Turek,
``input/input_hoffmann_3D_Re3900.json-metadata:1-3``).

3D LES / experiment: St = 0.210, c_D = 1.04.  Strictly 2D computations
at Re 3900 over-predict both (no vortex stretching): published 2D
values cluster at St 0.21-0.26, c_D 1.2-1.7.  The acceptance windows
below cover the 2D range while rejecting a broken shedding cycle.

Fast path: asserts on the stored series artifact
(``validation/wake_re3900_ref2.json``, produced by
``tools/wake_re3900.py``).  Set NS_WAKE=1 to re-run the simulation from
scratch instead (~40 min on one CPU core).
"""

import json
import os

import numpy as np
import pytest

_VAL = os.path.join(os.path.dirname(__file__), "..", "validation")
_CANDIDATES = [
    os.path.join(_VAL, f"wake_re3900_ref{r}.json") for r in (4, 3, 2)
]
ART = next((p for p in _CANDIDATES if os.path.exists(p)), _CANDIDATES[-1])

ST_WINDOW = (0.18, 0.27)
CD_WINDOW = (1.0, 2.2)


def check_stats(stats):
    assert stats["n_periods"] >= 5, stats
    assert ST_WINDOW[0] <= stats["strouhal"] <= ST_WINDOW[1], stats
    assert CD_WINDOW[0] <= stats["drag_mean"] <= CD_WINDOW[1], stats
    assert stats["lift_rms"] > 0.05, stats     # shedding actually happens


@pytest.mark.skipif(
    not os.path.exists(ART) and os.environ.get("NS_WAKE") != "1",
    reason="no stored wake artifact; set NS_WAKE=1 to run the simulation",
)
def test_wake_re3900_stats():
    if os.environ.get("NS_WAKE") == "1" or not os.path.exists(ART):
        import sys

        sys.path.insert(
            0, os.path.join(os.path.dirname(__file__), "..")
        )
        from tools.wake_re3900 import run

        out = run(3, 0.45, ART, cfl=0.7)
        stats = out["stats"]
    else:
        stats = json.load(open(ART))["stats"]
    check_stats(stats)


def test_wake_stats_extraction():
    """The Strouhal extractor itself, on a synthetic shedding series."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.wake_re3900 import U_BAR, D, wake_stats

    st_true = 0.22
    f = st_true * U_BAR / D
    t = np.linspace(0.0, 0.3, 4000)
    lift = 0.8 * np.sin(2 * np.pi * f * t)
    drag = 1.5 + 0.05 * np.sin(4 * np.pi * f * t)
    s = wake_stats(t, drag, lift, t_tail=0.15)
    assert abs(s["strouhal"] - st_true) < 0.002
    assert abs(s["drag_mean"] - 1.5) < 0.01
