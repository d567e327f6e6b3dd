"""Point-Jacobi / identity preconditioners (reference: DiagonalMatrix-based
smoother preconditioner, ``multigrid.h:67-69``; PreconditionIdentity)."""

from __future__ import annotations


def _jacobi_apply(inv_diag, x):
    return inv_diag * x


def _identity_apply(args, x):
    return x


class PreconditionerIdentity:
    vmult_pure = staticmethod(_identity_apply)
    vmult_args = ()

    def initialize(self):
        pass

    def vmult(self, x):
        return x

    def print_stats(self):
        pass


class PreconditionerJacobi:
    """M = diag(A)^{-1} of the (constrained) operator."""

    def __init__(self, op):
        self.op = op
        self.inv_diag = None

    def initialize(self):
        from ns_gls_tpu.ops.assembly import compute_inverse_diagonal

        self.inv_diag = compute_inverse_diagonal(self.op)

    vmult_pure = staticmethod(_jacobi_apply)

    @property
    def vmult_args(self):
        if self.inv_diag is None:
            self.initialize()
        return self.inv_diag

    def vmult(self, x):
        return self.vmult_args * x

    def print_stats(self):
        pass
