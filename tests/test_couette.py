"""Taylor-Couette (rotation case) validated against the analytic solution.

Steady Stokes/NS Couette flow between rotating inner cylinder (r=1/4,
u_theta = r at the wall => u_theta(1/4) = 1/4) and fixed outer cylinder
(r=1): u_theta(r) = (1/r - r) / 15.  This exercises the hyper_shell mesh,
polar manifold, inhomogeneous rotation BCs, the all-Dirichlet singular
pressure mode, and the coarse-level pressure pin (``main.cc:453-477``).
"""

import numpy as np
import pytest

from ns_gls_tpu.config import Parameters
from ns_gls_tpu.utils import logging as nslog

nslog.set_verbose(False)


@pytest.mark.slow
def test_couette_analytic():
    from ns_gls_tpu.driver import Driver

    p = Parameters.from_dict(
        {
            "dim": 2,
            "fe degree": 2,
            "mapping degree": 0,
            "n global refinements": 1,
            "simulation name": "rotation",
            "time intration": "none",
            "c1": 2.0,
            "c2": 0.0,
            "nu": 6.25,
            "consider time derivative": False,
            "cell wise stabilization": False,
            "lin absolute tolerance": 1e-10,
            "lin relative tolerance": 1e-6,
            "preconditioner": "GMG",
            "gmg coarse grid solver": "direct",
            "gmg constraint coarse pressure dof": True,
            "nonlinear solver": "Newton",
            "output granularity": 0.0,
        }
    )
    d = Driver(p)
    d.run()
    u = np.asarray(d.solution.current)

    # sample u_theta at nodes away from the boundaries
    r = np.linalg.norm(d.space.node_pos, axis=1)
    sel = (r > 0.4) & (r < 0.8)
    pos = d.space.node_pos[sel]
    rr = r[sel]
    t_hat = np.stack([-pos[:, 1] / rr, pos[:, 0] / rr], axis=1)
    u_theta = (u[sel, :2] * t_hat).sum(axis=1)
    exact = (1.0 / rr - rr) / 15.0
    err = np.abs(u_theta - exact).max()
    assert err < 5e-3, err
