"""BDF weight closed forms (reference ``time_integration.cc:61-91``)."""

import numpy as np
import pytest

from ns_gls_tpu.ops.time_integration import (
    BDFIntegrator,
    StationaryIntegrator,
    ThetaIntegrator,
    make_time_integrator,
)


def test_bdf1():
    ti = BDFIntegrator(1)
    ti.update_dt(0.25)
    assert ti.weights == (4.0, -4.0)
    assert ti.primary_weight == 4.0
    assert ti.current_dt == 0.25


def test_bdf2_uniform():
    ti = BDFIntegrator(2)
    ti.update_dt(0.1)  # startup: effective order 1
    assert np.allclose(ti.weights, (10.0, -10.0, 0.0))
    ti.update_dt(0.1)
    # uniform BDF2: (3/2, -2, 1/2)/dt
    assert np.allclose(ti.weights, (15.0, -20.0, 5.0))


def test_bdf_variable_consistency():
    """Variable-step weights must differentiate polynomials of degree <=
    order exactly: sum_i w_i p(t_i) == p'(t_{n+1})."""
    for order, dts in ((2, [0.2, 0.1]), (3, [0.3, 0.2, 0.1])):
        ti = BDFIntegrator(order)
        for dt in dts:
            ti.update_dt(dt)
        w = ti.weights
        t = [0.0]
        for dt in dts[::-1]:  # dts[-1] is the current step
            t.append(t[-1] - dt)
        t = np.array(t)  # t_{n+1}, t_n, t_{n-1}, ...
        for p, dp in ((lambda x: np.ones_like(x), 0.0),
                      (lambda x: x, 1.0),
                      (lambda x: x**2, 0.0)):
            deriv = sum(w[i] * p(t[i]) for i in range(order + 1))
            assert np.isclose(deriv, dp), (order, deriv, dp)


def test_bdf3_uniform():
    ti = BDFIntegrator(3)
    for _ in range(3):
        ti.update_dt(0.1)
    # uniform BDF3: (11/6, -3, 3/2, -1/3)/dt
    assert np.allclose(ti.weights, (110 / 6, -30.0, 15.0, -10 / 3))


def test_theta():
    ti = ThetaIntegrator(0.5)
    ti.update_dt(0.5)
    assert ti.weights == (2.0, -2.0)
    assert ti.theta == 0.5
    assert ti.order == 1


def test_stationary():
    ti = StationaryIntegrator()
    ti.update_dt(123.0)
    assert ti.primary_weight == 0.0
    assert ti.current_dt == 1.0
    assert ti.order == 0


def test_factory():
    assert isinstance(make_time_integrator("bdf", 2, 0.5), BDFIntegrator)
    assert isinstance(make_time_integrator("theta", 2, 0.5), ThetaIntegrator)
    assert isinstance(make_time_integrator("none", 2, 0.5), StationaryIntegrator)
    with pytest.raises(ValueError):
        make_time_integrator("rk4", 1, 0.5)
