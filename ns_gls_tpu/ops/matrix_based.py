"""Matrix-based NS operator: assembled sparse matrix + SpMV apply.

Equivalent of the reference's fallback ``NavierStokesOperatorMatrixBased``
(``operator_ns.h:196-267``, assembly ``operator_ns.cc:1600-1756``): the
same GLS system in assembled form (fixed-point flavor only, as in the
reference), applied as a sparse matvec.  Used for cross-checking the
matrix-free path (``use matrix free ns operator: false``) and for the
``mb`` lane of the vmult benchmark (``performance.cc:89-95``).

TPU mapping: the assembled matrix is stored as padded ELL (fixed nonzeros
per row) so the SpMV is a dense gather + einsum — no dynamic sparsity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ns_gls_tpu.fem import constraints as cstr


class ELLMatrix(NamedTuple):
    cols: jnp.ndarray  # (n_rows, max_nnz) int32, padded with row index
    vals: jnp.ndarray  # (n_rows, max_nnz)

    @property
    def n_rows(self):
        return self.cols.shape[0]


def ell_from_coo(n_rows: int, rows, cols, vals, dtype) -> ELLMatrix:
    """Build padded-ELL from COO triplets (duplicates are summed)."""
    import scipy.sparse as sp

    A = sp.coo_matrix((vals, (rows, cols)), shape=(n_rows, n_rows)).tocsr()
    A.sum_duplicates()
    nnz_per_row = np.diff(A.indptr)
    max_nnz = int(nnz_per_row.max())
    ecols = np.tile(np.arange(n_rows, dtype=np.int64)[:, None], (1, max_nnz))
    evals = np.zeros((n_rows, max_nnz))
    for r in range(n_rows):
        s, e = A.indptr[r], A.indptr[r + 1]
        ecols[r, : e - s] = A.indices[s:e]
        evals[r, : e - s] = A.data[s:e]
    return ELLMatrix(
        cols=jnp.asarray(ecols.astype(np.int32)),
        vals=jnp.asarray(evals, dtype),
    )


def ell_spmv(m: ELLMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """y = A x for flattened x (n_rows,)."""
    return jnp.einsum("rk,rk->r", m.vals, x[m.cols])


class NavierStokesOperatorMatrixBased:
    """Assembles the linear(ized) GLS system from the matrix-free kernel's
    element matrices (``jax.jacfwd``) and applies it as a padded-ELL SpMV.

    Wraps a matrix-free operator for state handling: assembly happens
    lazily per linearization point (``invalidate_system`` semantics,
    ``operator_ns.cc:227-232``).
    """

    def __init__(self, op):
        self.op = op  # a NavierStokesOperator holding space/state
        self._ell: ELLMatrix | None = None

    # -- reference OperatorBase surface ----------------------------------
    @property
    def space(self):
        return self.op.space

    @property
    def dtype(self):
        return self.op.dtype

    @property
    def n_comp(self):
        return self.op.n_comp

    @property
    def n_nodes(self):
        return self.op.n_nodes

    @property
    def constraints_homogeneous(self):
        return self.op.constraints_homogeneous

    @property
    def constraints_inhomogeneous(self):
        return self.op.constraints_inhomogeneous

    @constraints_inhomogeneous.setter
    def constraints_inhomogeneous(self, value):
        self.op.constraints_inhomogeneous = value

    def set_linearization_point(self, u):
        self.op.set_linearization_point(u)
        self._ell = None

    def set_previous_solution(self, history):
        self.op.set_previous_solution(history)
        self._ell = None

    def invalidate_system(self):
        self.op.invalidate_system()
        self._ell = None

    def update_weight(self):
        self.op.update_weight()
        self._ell = None

    def evaluate_rhs(self):
        return self.op.evaluate_rhs()

    def evaluate_residual(self, u):
        return self.op.evaluate_residual(u)

    def get_max_u(self, u):
        return self.op.get_max_u(u)

    # -- assembled apply ---------------------------------------------------
    def assemble(self) -> ELLMatrix:
        """Raw (unconstrained) element matrices scattered to global ELL;
        the constraint sandwich is applied around the SpMV, matching the
        matrix-free path exactly."""
        from ns_gls_tpu.ops.assembly import element_matrices

        emat = element_matrices(self.op)  # (n_c, nl, nl)
        C = self.n_comp
        gdofs = (
            np.asarray(self.op.batch.cell_nodes)[:, :, None] * C
            + np.arange(C)[None, None, :]
        ).reshape(len(emat), -1)
        nl = gdofs.shape[1]
        rows = np.repeat(gdofs, nl, axis=1).reshape(-1)
        cols = np.tile(gdofs, (1, nl)).reshape(-1)
        vals = np.asarray(emat, dtype=np.float64).reshape(-1)
        n = self.n_nodes * C
        return ell_from_coo(n, rows, cols, vals, self.dtype)

    @property
    def ell(self) -> ELLMatrix:
        if self._ell is None:
            self._ell = self.assemble()
        return self._ell

    def vmult_pure_factory(self):
        ch = self.constraints_homogeneous

        def vmult_fn(args, u):
            ell = args
            shape = u.shape
            u_eff = cstr.distribute(ch, u, homogeneous=True)
            r = ell_spmv(ell, u_eff.reshape(-1)).reshape(shape)
            r = cstr.condense_transpose(ch, r)
            return cstr.copy_constrained(ch, r, u)

        return vmult_fn

    @property
    def vmult_pure(self):
        if not hasattr(self, "_vmult_pure"):
            self._vmult_pure = self.vmult_pure_factory()
            self._vmult_jit = jax.jit(self._vmult_pure)
        return self._vmult_pure

    @property
    def vmult_args(self):
        return self.ell

    def vmult(self, u):
        _ = self.vmult_pure
        return self._vmult_jit(self.ell, u)
