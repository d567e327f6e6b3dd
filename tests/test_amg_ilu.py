"""AMG + ILU preconditioner tests: GMRES iteration counts must drop vs.
unpreconditioned, and e2e channel runs converge (the reference's
single-level preconditioner options, ``preconditioner.cc``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ns_gls_tpu.config import Parameters
from ns_gls_tpu.solvers.linear import gmres
from ns_gls_tpu.utils import logging as nslog

nslog.set_verbose(False)


def make_op():
    import sys

    sys.path.insert(0, "tests")
    from test_operator import make_setup

    return make_setup(dim=2, degree=1, increment_form=True, refinements=2)


def test_amg_reduces_iterations():
    from ns_gls_tpu.precond.amg import PreconditionerAMG

    op, space, u0 = make_op()
    amg = PreconditionerAMG(op)
    amg.initialize()
    b = op.evaluate_residual(u0)

    plain = gmres(op.vmult_pure, op.vmult_args, b, jnp.zeros_like(b),
                  tol=1e-8 * float(jnp.linalg.norm(b.reshape(-1))))
    pc = gmres(op.vmult_pure, op.vmult_args, b, jnp.zeros_like(b),
               M=amg.vmult_pure, m_args=amg.vmult_args,
               tol=1e-8 * float(jnp.linalg.norm(b.reshape(-1))))
    assert pc.converged
    assert int(pc.iterations) < int(plain.iterations), (
        int(pc.iterations), int(plain.iterations))


def test_ilu_reduces_iterations():
    from ns_gls_tpu.precond.ilu import PreconditionerILU

    op, space, u0 = make_op()
    ilu = PreconditionerILU(op)
    ilu.initialize()
    b = op.evaluate_residual(u0)
    tol = 1e-8 * float(jnp.linalg.norm(b.reshape(-1)))
    plain = gmres(op.vmult_pure, op.vmult_args, b, jnp.zeros_like(b), tol=tol)
    pc = gmres(op.vmult_pure, op.vmult_args, b, jnp.zeros_like(b),
               M=ilu.vmult_pure, m_args=(), tol=tol)
    assert pc.converged
    assert int(pc.iterations) < int(plain.iterations), (
        int(pc.iterations), int(plain.iterations))


@pytest.mark.slow
def test_channel_amg_e2e():
    from ns_gls_tpu.driver import Driver

    p = Parameters.from_dict(
        {
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
            "lin relative tolerance": 1e-4,
            "preconditioner": "AMG",
            "nonlinear solver": "Newton",
            "output granularity": 0.0,
        }
    )
    d = Driver(p)
    d.run(max_steps=2)
    assert np.isfinite(np.asarray(d.solution.current)).all()
