"""Driver-level multi-device runs ('n devices' config key): the sharded
time loop must reproduce the single-device solution."""

import jax
import numpy as np
import pytest

from ns_gls_tpu.config import Parameters
from ns_gls_tpu.utils import logging as nslog

nslog.set_verbose(False)

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

CFG = {
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
    "lin relative tolerance": 1e-8,
    "preconditioner": "GMG",
    "gmg coarse grid solver": "direct",
    "nonlinear solver": "Newton",
    "output granularity": 0.0,
}


@needs_8
def test_sharded_driver_matches_single_device():
    from ns_gls_tpu.driver import Driver

    d1 = Driver(Parameters.from_dict(CFG))
    d1.run(max_steps=2)

    d8 = Driver(Parameters.from_dict(CFG | {"n devices": 8}))
    d8.run(max_steps=2)

    a = np.asarray(d1.solution.current)
    b = np.asarray(d8.solution.current)
    assert np.allclose(a, b, atol=1e-8), np.abs(a - b).max()


@needs_8
def test_halo_driver_turek_cylinder():
    """'n devices' routes to the general-mesh halo-exchange path
    (parallel/halo.py) on the flagship unstructured geometry; the sharded
    time loop must match the single-device solution."""
    from ns_gls_tpu.driver import Driver

    cfg = CFG | {
        "simulation name": "cylinder",
        "nu": 0.001,
        "simulation u max": 0.3,
        "lin relative tolerance": 1e-6,
        "nonlinear tolerance": 1e-4,
    }
    d1 = Driver(Parameters.from_dict(cfg))
    d1.run(max_steps=2)

    d8 = Driver(Parameters.from_dict(cfg | {"n devices": 8}))
    d8.run(max_steps=2)
    from ns_gls_tpu.parallel.halo import HaloShardedOperator

    assert isinstance(d8.op, HaloShardedOperator)

    a = np.asarray(d1.solution.current)
    b = np.asarray(d8.solution.current)
    assert np.allclose(a, b, atol=2e-5 * max(1.0, np.abs(a).max())), \
        np.abs(a - b).max()


@needs_8
def test_replicated_strategy_still_available():
    from ns_gls_tpu.driver import Driver
    from ns_gls_tpu.parallel.sharding import ShardedOperator

    d = Driver(Parameters.from_dict(
        CFG | {"n devices": 8, "parallel strategy": "replicated"}
    ))
    d.run(max_steps=1)
    assert isinstance(d.op, ShardedOperator)
    assert np.isfinite(np.asarray(d.solution.current)).all()


@needs_8
def test_halo_driver_f64_outer():
    """The sharded time loop at the REFERENCE'S OUTER PRECISION
    (``config.h:6-7``: double outer solve, float MG): an f64 8-device
    halo run must match the single-device f64 run to f64 tightness —
    the f32 variants above would mask a sharded-path cast that silently
    truncates the outer solve."""
    from ns_gls_tpu.driver import Driver

    cfg = CFG | {
        "simulation name": "cylinder",
        "nu": 0.001,
        "simulation u max": 0.3,
        "precision": "f64",
        "mg precision": "f32",
        "lin relative tolerance": 1e-10,
        "nonlinear tolerance": 1e-10,
    }
    d1 = Driver(Parameters.from_dict(cfg))
    d1.run(max_steps=2)

    d8 = Driver(Parameters.from_dict(cfg | {"n devices": 8}))
    d8.run(max_steps=2)

    a = np.asarray(d1.solution.current)
    assert a.dtype == np.float64
    b = np.asarray(d8.solution.current)
    assert b.dtype == np.float64
    assert np.allclose(a, b, atol=1e-9 * max(1.0, np.abs(a).max())), \
        np.abs(a - b).max()
