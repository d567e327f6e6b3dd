"""End-to-end smoke + physics test for the Taylor-Couette ``rotation``
case (reference ``input/rotation.json`` + ``simulation.cc:789-848``).

This config exercises the hardest constraint pipeline in one shot:
boundary-adaptive annulus with HANGING nodes on CURVED (polar-manifold)
interfaces, all-Dirichlet BCs (floating pressure -> pin), GMG over the
refinement-generation chain, Newton in increment form.  Regression for
the write-side Cᵀ in the residual and the projection-based hanging
pairing."""

import numpy as np

from ns_gls_tpu.config import Parameters
from ns_gls_tpu.driver import Driver

CFG = {
    "dim": 2,
    "fe degree": 1,
    "mapping degree": 1,
    "n global refinements": 2,
    "simulation name": "rotation",
    "cfl": 0.1,
    "t final": 1e9,  # steps limited below
    "bdf order": 1,
    "time intration": "bdf",
    "c1": 2.0,
    "c2": 0.0,
    "nu": 6.25,
    "consider time derivative": True,
    "cell wise stabilization": False,
    "lin absolute tolerance": 1e-8,
    "lin relative tolerance": 1e-4,
    "preconditioner": "GMG",
    "gmg coarse grid solver": "direct",
    "gmg constraint coarse pressure dof": True,
    "nonlinear solver": "Newton",
    "output granularity": 1e9,
}


def test_rotation_newton_quadratic():
    """Newton must converge quadratically (<= 3 steps) on the curved
    adaptive annulus; guards residual/Jacobian consistency through the
    hanging-node + pressure-pin constraint machinery."""
    d = Driver(Parameters.from_dict(dict(CFG)))
    d.run(max_steps=3)
    assert d.nonlinear_solver.last_iterations <= 3

    # mesh really is adaptive with hanging nodes on the curved interface
    assert d.mesh.is_adaptive
    assert d.csets.homogeneous.n > 0

    # solution is a sensible rotation field: u ~ omega x r at the inner ring
    u = np.asarray(d.solution.vectors[0])
    pos = d.space.node_pos
    r = np.linalg.norm(pos, axis=1)
    inner = r < r.min() + 1e-8
    uth = (-pos[:, 1] * u[:, 0] + pos[:, 0] * u[:, 1]) / r
    np.testing.assert_allclose(uth[inner], r.min(), rtol=1e-8)
