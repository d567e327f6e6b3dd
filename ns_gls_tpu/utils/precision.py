"""TPU matmul precision policy.

TPU MXU matmuls default to bf16 inputs (8-bit mantissa). For the FE
sum-factorization einsums that build residuals and Jacobians this is NOT
enough: inexact Newton stalls at ~1e-2 relative residual (round-2 TPU
debugging; CPU f32 converges to 3e-4 in 3 iterations on the same
problem). One notch up — "high", the bf16_3x decomposition — restores
f32-equivalent Newton convergence at ~1/2 the cost of full "highest".

Called from the Driver and the bench harnesses before anything jits.
Respects an explicit user setting.
"""

import jax


def ensure_tpu_matmul_precision(level: str = "high") -> None:
    if jax.default_backend() != "tpu":
        return
    if jax.config.jax_default_matmul_precision is not None:
        return  # user already chose
    jax.config.update("jax_default_matmul_precision", level)
