"""No-normal-flux (slip) boundary conditions on curved boundaries
(deal.II ``compute_no_normal_flux_constraints``, ``main.cc:285-287``),
as used by the Hoffmann/ReInf and sphere cases."""

import numpy as np
import pytest

from ns_gls_tpu.config import Parameters
from ns_gls_tpu.utils import logging as nslog

nslog.set_verbose(False)


@pytest.mark.slow
def test_slip_cylinder_stationary():
    """Euler-like flow past a slip cylinder with slip walls: after the
    stationary solve, n . u must vanish on the cylinder surface and the
    flow must stay attached (no wake deficit)."""
    from ns_gls_tpu.driver import Driver

    p = Parameters.from_dict(
        {
            "dim": 2,
            "fe degree": 2,
            "mapping degree": 0,
            "n global refinements": 1,
            "simulation name": "cylinder",
            "time intration": "none",
            "c1": 1.0,
            "c2": 1.0,
            # moderate Re: stationary Newton from zero converges (the
            # reference reaches its near-inviscid slip states by time
            # stepping, not by a cold stationary solve)
            "nu": 0.01,
            "consider time derivative": False,
            "cell wise stabilization": False,
            "lin relative tolerance": 1e-4,
            "lin n max iterations": 100000,
            "preconditioner": "GMG",
            "gmg coarse grid solver": "direct",
            "nonlinear solver": "Newton",
            "output granularity": 0.0,
            "simulation no slip cylinder": False,
            "simulation no slip wall": False,
            "simulation u max": 1.0,
            "simulation t init": 0.0,
        }
    )
    d = Driver(p)
    d.run()
    u = np.asarray(d.solution.current)

    # n.u = 0 on the cylinder (id 2): radial direction is the normal
    nodes, normals = d.space.boundary_node_normals([2])
    flux = (u[nodes, :2] * normals).sum(axis=1)
    assert np.abs(flux).max() < 1e-10, np.abs(flux).max()

    # slip walls (ids 3,4): u_y = 0
    wn = d.space.boundary_nodes([3, 4])
    assert np.abs(u[wn, 1]).max() < 1e-10

    # potential-like flow: tangential speed at the cylinder shoulder
    # should exceed the free stream (ideal flow: 2x; viscous slip at this
    # Re and resolution: ~1.18)
    speeds = np.linalg.norm(u[nodes, :2], axis=1)
    assert speeds.max() > 1.1
