"""Matrix-based operator must reproduce the matrix-free apply exactly
(the reference's own redundancy cross-check, SURVEY §4 item 2)."""

import jax.numpy as jnp
import numpy as np

from ns_gls_tpu.ops.matrix_based import NavierStokesOperatorMatrixBased


def test_matrix_based_equals_matrix_free():
    import sys

    sys.path.insert(0, "tests")
    from test_operator import make_setup

    op, space, u0 = make_setup(dim=2, degree=1, increment_form=False)
    mb = NavierStokesOperatorMatrixBased(op)

    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal((space.n_nodes, 3)))
    a = np.asarray(op.vmult(v))
    b = np.asarray(mb.vmult(v))
    assert np.allclose(a, b, atol=1e-10), np.abs(a - b).max()
