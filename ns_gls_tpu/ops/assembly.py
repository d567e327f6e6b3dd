"""Exact element matrices, operator diagonal, and global (dense/COO)
assembly — derived from the *same* q-point physics as the matrix-free
apply via ``jax.jacfwd`` (the operator is linear, so the Jacobian of the
local apply *is* the element matrix).

Replaces the reference's basis-vector tricks:
- ``MatrixFreeTools::compute_diagonal`` (``operator_ns.cc:195-225``)
- ``MatrixFreeTools::compute_matrix`` / ``initialize_system_matrix``
  (``operator_ns.cc:1303-1434``) used for the GMG coarse solve, AMG/ILU,
  and the direct solver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator, fe_evaluate, fe_integrate


def _local_apply(op: NavierStokesOperator):
    """Single-cell linear apply: (u_loc, jinv, jxw, cq_cell) -> r_loc.
    cq_cell: per-cell slices of the linearization tables."""

    def f(u_loc, jinv, jxw, cq):
        val, grad = fe_evaluate(op.batch.S, op.batch.D, jinv, u_loc)
        if op.increment_form:
            val_res, grad_res = op.qpoint_increment(val, grad, cq)
        else:
            val_res, grad_res = op.qpoint_fixed_point(
                val, grad, cq, residual=False
            )
        return fe_integrate(op.batch.S, op.batch.D, jinv, jxw, val_res, grad_res)

    return f


def _cq_cell_tree(op: NavierStokesOperator):
    """Per-cell pytree of linearization tables (leading axis n_c).
    For fused-mode operators the tables are materialized from the stored
    vectors (assembly is a cold path, so the extra memory is fine)."""
    s = op.state
    if op.fuse_tables:
        cq = op._fused_cq(op.batch, s)
        n_c = op.space.mesh.n_cells
        n_q = op.space.element.n_q
        d = op.dim
        if cq["u_old_grad"] is None:
            cq["u_old_grad"] = jnp.zeros((n_c, n_q, d, d), op.dtype)
            cq["p_old_grad"] = jnp.zeros((n_c, n_q, d), op.dtype)
        if op.cell_wise_stabilization:
            cq["delta1"] = s.delta1
            cq["delta2"] = s.delta2
        return cq
    return dict(
        weight=s.weight,  # scalar, broadcast below via in_axes=None
        u_star=s.u_star,
        grad_u_star=s.grad_u_star,
        grad_p_star=s.grad_p_star,
        dt_u_old=s.dt_u_old,
        u_old_grad=s.u_old_grad,
        p_old_grad=s.p_old_grad,
        delta1=s.delta1,
        delta2=s.delta2,
    )


def element_matrices(op: NavierStokesOperator, cells: np.ndarray | None = None,
                     chunk: int = 2048) -> np.ndarray:
    """Dense element matrices A_loc (n_sel, n_loc*C, n_loc*C) in the
    flattened local dof order (i * C + c)."""
    n_loc = op.space.element.n_loc
    C = op.n_comp

    # memoized on the operator (same reason as compute_diagonal: a fresh
    # jit wrapper per call would recompile on every rebuild)
    emat_v = getattr(op, "_emat_v", None)
    if emat_v is None:
        f = _local_apply(op)

        def emat(jinv, jxw, cq):
            u0 = jnp.zeros((n_loc, C), op.dtype)
            J = jax.jacfwd(lambda u: f(u, jinv, jxw, cq))(u0)
            return J.reshape(n_loc * C, n_loc * C)

        cq_axes = {
            k: (None if k == "weight" else 0) for k in _cq_cell_tree(op)
        }
        emat_v = jax.jit(jax.vmap(emat, in_axes=(0, 0, cq_axes)))
        op._emat_v = emat_v

    sel = np.arange(op.space.mesh.n_cells) if cells is None else np.asarray(cells)
    cq_all = _cq_cell_tree(op)
    out = []
    for lo in range(0, len(sel), chunk):
        idx = jnp.asarray(sel[lo : lo + chunk])
        cq = {
            k: (v if k == "weight" else v[idx]) for k, v in cq_all.items()
        }
        out.append(
            np.asarray(emat_v(op.batch.jinv[idx], op.batch.jxw[idx], cq))
        )
    return np.concatenate(out, axis=0)


def compute_diagonal(op: NavierStokesOperator, chunk: int = 2048) -> jnp.ndarray:
    """Diagonal of the (constrained) operator, shape (n_nodes, C).

    Constrained rows get 1.0.  (Approximation vs. deal.II's
    ``compute_diagonal``: contributions of constraint weights w_ri to
    unconstrained diagonal entries are dropped — exact for Dirichlet /
    pressure-pin constraints, approximate for slip/periodic rows; the
    Jacobi smoother tolerates this.)"""
    n_loc = op.space.element.n_loc
    C = op.n_comp

    # memoize the jitted per-cell diagonal kernel on the operator: a
    # fresh jax.jit wrapper per call defeats the jit cache (new function
    # identity), so every preconditioner rebuild paid a full
    # retrace+recompile (~0.75 s/level/step, over half the measured
    # Turek step time)
    ediag_v = getattr(op, "_ediag_v", None)
    if ediag_v is None:
        f = _local_apply(op)

        def ediag(jinv, jxw, cq):
            u0 = jnp.zeros((n_loc, C), op.dtype)
            J = jax.jacfwd(lambda u: f(u, jinv, jxw, cq))(u0)
            return jnp.diagonal(
                J.reshape(n_loc * C, n_loc * C)
            ).reshape(n_loc, C)

        cq_axes = {
            k: (None if k == "weight" else 0) for k in _cq_cell_tree(op)
        }
        ediag_v = jax.jit(jax.vmap(ediag, in_axes=(0, 0, cq_axes)))
        op._ediag_v = ediag_v

    n_c = op.space.mesh.n_cells
    cq_all = _cq_cell_tree(op)
    diag = jnp.zeros((op.n_nodes, C), op.dtype)
    for lo in range(0, n_c, chunk):
        hi = min(lo + chunk, n_c)
        cq = {
            k: (v if k == "weight" else v[lo:hi]) for k, v in cq_all.items()
        }
        d_loc = ediag_v(op.batch.jinv[lo:hi], op.batch.jxw[lo:hi], cq)
        diag = diag.at[op.batch.cell_nodes[lo:hi]].add(d_loc)
    ca = op.constraints_homogeneous
    if ca.n:
        diag = diag.reshape(-1).at[ca.rows].set(1.0).reshape(diag.shape)
    return diag


def compute_inverse_diagonal(op: NavierStokesOperator) -> jnp.ndarray:
    """1/diag with the reference's safeguard (``operator_ns.cc:223-224``)."""
    d = compute_diagonal(op)
    return jnp.where(jnp.abs(d) > 1e-10, 1.0 / d, 1.0)


def assemble_dense(op: NavierStokesOperator) -> np.ndarray:
    """Assembled dense matrix of the *constrained* operator CᵀAC with
    identity on constrained rows/cols (float64, host).  Used for the GMG
    coarse solve and the dense direct solver (small problems only)."""
    n = op.n_nodes * op.n_comp
    A = np.zeros((n, n), dtype=np.float64)
    emat = element_matrices(op)
    gdofs = (
        np.asarray(op.batch.cell_nodes)[:, :, None] * op.n_comp
        + np.arange(op.n_comp)[None, None, :]
    ).reshape(len(emat), -1)
    for e in range(len(emat)):
        A[np.ix_(gdofs[e], gdofs[e])] += emat[e]

    ca = op.constraints_homogeneous
    if ca.n:
        rows = np.asarray(ca.rows)
        cols = np.asarray(ca.cols)
        wts = np.asarray(ca.weights, dtype=np.float64)
        # C: identity with constrained rows replaced by weights
        Cm = np.eye(n)
        Cm[rows, :] = 0.0
        for i, r in enumerate(rows):
            for c, w in zip(cols[i], wts[i]):
                if w != 0.0:
                    Cm[r, c] += w
        A = Cm.T @ A @ Cm
        A[rows, :] = 0.0
        A[:, rows] = 0.0
        A[rows, rows] = 1.0
    return A
