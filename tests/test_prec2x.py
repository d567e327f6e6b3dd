"""The "2x" Jacobian precision mode (ops/structured.py `_mm_tools`):
bf16-rounded band operands + hi/lo input split = 2 exact MXU passes.

The applied operator is a FIXED perturbation J~ of the Jacobian
(||dJ||/||J|| ~ 2^-9 per band application) — acceptable for a Newton
direction (the reference's own frozen-stabilization Jacobian,
``operator_ns.cc:949-1182``, is a larger perturbation) because the
convergence test uses the exact residual.  What must hold:

- J~ is CLOSE to J (a few 2^-9 relative),
- J~ is exactly LINEAR to f32 accumulation (the property per-entry bf16
  rounding lacks — that nonlinearity is what thrashed GMRES in the
  measured-negative NS_JAC_PREC=bf16 lane),
- the residual flavor is untouched (exact f32),
- solution-accuracy-bearing flavors (Picard's fixed-point system)
  silently demote to the exact-grade "3x".
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_structured import make_pair


def make_2x(dim, degree, increment):
    (op_g, op_s), space, u = make_pair(dim, degree, increment, True)
    # rebuild the structured sweep at the 2x point
    from ns_gls_tpu.ops.structured import StructuredSweep

    op_s.structured_precision = "2x"
    op_s._ssweep = StructuredSweep(op_s)
    return op_g, op_s, u


@pytest.mark.parametrize("dim,degree", [(2, 2), (3, 1)])
def test_2x_jacobian_close_and_linear(dim, degree):
    op_g, op_s, u = make_2x(dim, degree, increment=True)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(u.shape), jnp.float32)
    y = jnp.asarray(rng.standard_normal(u.shape), jnp.float32)

    a = np.asarray(op_g.vmult(x))
    s = np.asarray(op_s.vmult(x))
    rel = np.abs(a - s).max() / np.abs(a).max()
    # close: a few band applications of 2^-9 each
    assert rel <= 5e-2, rel
    # ...but genuinely the 2x operator (not silently exact)
    assert rel > 1e-7, rel

    # exactly linear to f32 accumulation: the Krylov-identity property
    ax = np.asarray(op_s.vmult(x))
    ay = np.asarray(op_s.vmult(y))
    axy = np.asarray(op_s.vmult(2.5 * x - 0.75 * y))
    defect = np.abs(axy - (2.5 * ax - 0.75 * ay)).max()
    assert defect <= 1e-4 * np.abs(axy).max(), (
        defect / np.abs(axy).max()
    )


@pytest.mark.parametrize("dim", [2, 3])
def test_2x_residual_exact(dim):
    """The residual flavor runs exact f32 regardless of the mode."""
    op_g, op_s, u = make_2x(dim, 1, increment=True)
    ra = np.asarray(op_g.evaluate_residual(u))
    rs = np.asarray(op_s.evaluate_residual(u))
    assert np.abs(ra - rs).max() <= 5e-6 * np.abs(ra).max()


def test_2x_demotes_for_fixed_point_flavor():
    """increment_form=False (Picard/linearized): the converged solution
    inherits operator error, so "2x" must demote to "3x" — the apply
    matches the general sweep at the usual roundoff tolerance."""
    op_g, op_s, u = make_2x(2, 2, increment=False)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(u.shape), jnp.float32)
    a = np.asarray(op_g.vmult(x))
    s = np.asarray(op_s.vmult(x))
    assert np.abs(a - s).max() <= 5e-6 * np.abs(a).max(), (
        np.abs(a - s).max() / np.abs(a).max()
    )
