"""Incomplete-LU preconditioner (reference ``preconditioner.cc:5-34``,
Trilinos ILU(0)).

Factorization and the two triangular solves are inherently sequential —
the one part of this framework that does NOT map to the TPU.  The
factorization runs on host (SuperLU ILU via scipy, drop-tolerance
configured to approximate ILU(0)); the apply is routed through
``jax.pure_callback`` so it composes with the jitted GMRES loop.  On CPU
backends this is exact parity with the reference; on TPU every apply
round-trips to the host — prefer GMG (all benchmark configs do).
"""

from __future__ import annotations

import jax
import numpy as np


class PreconditionerILU:
    def __init__(self, op, fill_factor: float = 3.0, drop_tol: float = 1e-5):
        self.op = op
        self.fill_factor = fill_factor
        self.drop_tol = drop_tol
        self._ilu = None
        self._build()

    def initialize(self):
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        from ns_gls_tpu.ops.assembly import element_matrices

        op = self.op
        C = op.n_comp
        emat = element_matrices(op)
        gdofs = (
            np.asarray(op.batch.cell_nodes)[:, :, None] * C
            + np.arange(C)[None, None, :]
        ).reshape(len(emat), -1)
        nl = gdofs.shape[1]
        rows = np.repeat(gdofs, nl, axis=1).reshape(-1)
        cols = np.tile(gdofs, (1, nl)).reshape(-1)
        n = op.n_nodes * C
        A = sp.coo_matrix(
            (np.asarray(emat, dtype=np.float64).reshape(-1), (rows, cols)),
            shape=(n, n),
        ).tocsc()
        ca = op.constraints_homogeneous
        if ca.n:
            crows = np.asarray(ca.rows)
            mask = np.ones(n, dtype=bool)
            mask[crows] = False
            D = sp.diags(mask.astype(np.float64))
            A = (D @ A @ D + sp.diags((~mask).astype(np.float64))).tocsc()
        self._ilu = spla.spilu(
            A, drop_tol=self.drop_tol, fill_factor=self.fill_factor
        )

    def _build(self):
        def host_solve(x):
            if self._ilu is None:
                self.initialize()
            return self._ilu.solve(
                np.asarray(x, dtype=np.float64).reshape(-1)
            ).astype(np.asarray(x).dtype).reshape(np.asarray(x).shape)

        def vmult_fn(args, x):
            del args
            return jax.pure_callback(
                host_solve,
                jax.ShapeDtypeStruct(x.shape, x.dtype),
                x,
                vmap_method="sequential",
            )

        self.vmult_pure = vmult_fn
        self._vmult = jax.jit(vmult_fn)

    vmult_args = ()

    def vmult(self, x):
        return self._vmult((), x)

    def print_stats(self):
        pass
