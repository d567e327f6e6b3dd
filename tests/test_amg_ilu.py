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


def test_amg_ilu_smoother_beats_jacobi():
    """'amg smoother': 'ilu' (reference ML-AMG smooths with Ifpack ILU,
    ``preconditioner.cc:49-77``): the ILU-smoothed V-cycle must converge
    GMRES in no more iterations than the Jacobi-smoothed one, and the
    device iterative-triangular-solve apply must approximate the host
    SuperLU solve."""
    from ns_gls_tpu.precond.amg import PreconditionerAMG, _ilu_factors

    op, space, u0 = make_op()
    b = op.evaluate_residual(u0)
    tol = 1e-8 * float(jnp.linalg.norm(b.reshape(-1)))

    its = {}
    for sm in ("jacobi", "ilu"):
        amg = PreconditionerAMG(op, smoother=sm)
        amg.initialize()
        pc = gmres(op.vmult_pure, op.vmult_args, b, jnp.zeros_like(b),
                   M=amg.vmult_pure, m_args=amg.vmult_args, tol=tol)
        assert pc.converged
        its[sm] = int(pc.iterations)
    assert its["ilu"] <= its["jacobi"], its

    # factor-apply accuracy vs the exact host triangular solves
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    rng = np.random.default_rng(3)
    n = 200
    A = (sp.random(n, n, 0.03, random_state=2)
         + sp.diags(np.full(n, 4.0))).tocsc()
    f = _ilu_factors(A, jnp.float64)
    ilu = spla.spilu(A, drop_tol=1e-5, fill_factor=3.0)
    r = rng.standard_normal(n)
    x_ref = ilu.solve(r)
    l_cols, l_vals, u_cols, u_vals, udi, ipr, pcm = f
    rp = jnp.asarray(r)[ipr]
    y = rp
    for _ in range(60):   # enough sweeps for exactness on this size
        y = rp - jnp.einsum("rk,rk->r", l_vals, y[l_cols])
    z = y * udi
    for _ in range(60):
        z = (y - jnp.einsum("rk,rk->r", u_vals, z[u_cols])) * udi
    x = np.asarray(z[pcm])
    assert np.abs(x - x_ref).max() < 1e-8 * np.abs(x_ref).max()


def test_amg_ilu_driver_config_key():
    from ns_gls_tpu.driver import Driver

    p = Parameters.from_dict(
        {
            "dim": 2,
            "fe degree": 1,
            "n global refinements": 0,
            "simulation name": "channel",
            "cfl": 0.1,
            "t final": 0.05,
            "bdf order": 1,
            "time intration": "bdf",
            "nu": 0.01,
            "consider time derivative": True,
            "lin relative tolerance": 1e-6,
            "preconditioner": "AMG",
            "amg smoother": "ilu",
            "nonlinear solver": "Picard",
            "output granularity": 0.0,
        }
    )
    d = Driver(p)
    d.run(max_steps=1)
    assert d.preconditioner.smoother == "ilu"
    assert np.isfinite(np.asarray(d.solution.current)).all()


def test_amg_device_refresh_matches_host_rebuild():
    """After the first initialize, AMG rebuilds refresh matrix values on
    device through the frozen slot-map chain — the result must match a
    from-scratch host rebuild at the new linearization point."""
    from ns_gls_tpu.fem.constraints import distribute
    from ns_gls_tpu.precond.amg import PreconditionerAMG

    op, space, u0 = make_op()
    amg = PreconditionerAMG(op)
    amg.initialize()
    assert amg._refresh_fn is not None

    # move the linearization point, then refresh (device path)
    rng = np.random.default_rng(3)
    u1 = distribute(
        op.constraints_inhomogeneous,
        u0 + 0.1 * jnp.asarray(rng.standard_normal(u0.shape), u0.dtype),
    )
    op.set_linearization_point(u1)
    amg.initialize()
    args_dev = amg.vmult_args

    # fresh preconditioner = full host build at the same point
    amg2 = PreconditionerAMG(op)
    amg2.initialize()
    args_host = amg2.vmult_args

    r = jnp.asarray(rng.standard_normal(u0.shape), u0.dtype)
    a = np.asarray(amg.vmult_pure(args_dev, r))
    b = np.asarray(amg2.vmult_pure(args_host, r))
    assert np.abs(a - b).max() <= 5e-5 * max(np.abs(b).max(), 1e-30), (
        np.abs(a - b).max(), np.abs(b).max()
    )
