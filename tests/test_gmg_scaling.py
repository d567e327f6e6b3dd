"""GMG quality: preconditioned GMRES iteration counts must stay (nearly)
mesh-independent under refinement — the guardrail the reference relies on
(SURVEY §7 'iteration counts are the guardrail')."""

import jax.numpy as jnp
import numpy as np
import pytest

from ns_gls_tpu.config import Parameters
from ns_gls_tpu.utils import logging as nslog

nslog.set_verbose(False)


@pytest.mark.slow
def test_gmg_iterations_mesh_independent():
    from ns_gls_tpu.driver import Driver

    counts = {}
    for ref in (1, 2, 3):
        p = Parameters.from_dict(
            {
                "dim": 2,
                "fe degree": 1,
                "n global refinements": ref,
                "simulation name": "channel",
                "cfl": 0.1,
                "t final": 1.0,
                "bdf order": 1,
                "time intration": "bdf",
                "nu": 0.01,
                "consider time derivative": True,
                "lin relative tolerance": 1e-8,
                "preconditioner": "GMG",
                "gmg coarse grid solver": "direct",
                "nonlinear solver": "Newton",
                "output granularity": 0.0,
            }
        )
        d = Driver(p)
        d.run(max_steps=1)
        counts[ref] = d.linear_solver.last_iterations
    # total iterations of the last solve must not blow up with refinement
    assert counts[3] <= max(2 * counts[1], counts[1] + 8), counts
    assert counts[3] <= 40, counts
