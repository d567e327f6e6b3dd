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
    # jit wrapper per call would recompile on every rebuild). The cell
    # selection/chunking runs INSIDE one jit (gathers on device, chunked
    # via a rolled fori + static tail so jacfwd intermediates stay
    # bounded), and the result ships in ONE host fetch — the eager
    # per-chunk loop paid ~10 device round trips per rebuild on the
    # tunneled TPU.
    _ensure_emat_all(op, chunk)
    sel = np.arange(op.space.mesh.n_cells) if cells is None else np.asarray(cells)
    return np.asarray(
        op._emat_all(op.batch.jinv, op.batch.jxw, _cq_cell_tree(op),
                     jnp.asarray(sel.astype(np.int32)))
    )


def _ensure_emat_all(op: NavierStokesOperator, chunk: int = 2048) -> None:
    n_loc = op.space.element.n_loc
    C = op.n_comp
    if getattr(op, "_emat_all", None) is None:
        f = _local_apply(op)

        def emat(jinv, jxw, cq):
            u0 = jnp.zeros((n_loc, C), op.dtype)
            J = jax.jacfwd(lambda u: f(u, jinv, jxw, cq))(u0)
            return J.reshape(n_loc * C, n_loc * C)

        cq_axes = {
            k: (None if k == "weight" else 0) for k in _cq_cell_tree(op)
        }
        emat_v = jax.vmap(emat, in_axes=(0, 0, cq_axes))

        def impl(jinv, jxw, cq_all, sel):
            n_sel = sel.shape[0]
            n_full = n_sel // chunk
            tail = n_sel - n_full * chunk
            nlc = n_loc * C

            def chunk_mats(lo, size):
                idx = jax.lax.dynamic_slice_in_dim(sel, lo, size, 0)
                cq = {
                    k: (v if k == "weight" else v[idx])
                    for k, v in cq_all.items()
                }
                return emat_v(jinv[idx], jxw[idx], cq)

            out = jnp.zeros((n_sel, nlc, nlc), op.dtype)
            if n_full:
                out = jax.lax.fori_loop(
                    0, n_full,
                    lambda i, o: jax.lax.dynamic_update_slice_in_dim(
                        o, chunk_mats(i * chunk, chunk), i * chunk, 0
                    ),
                    out,
                )
            if tail:
                out = jax.lax.dynamic_update_slice_in_dim(
                    out, chunk_mats(n_full * chunk, tail), n_full * chunk, 0
                )
            return out

        op._emat_all = jax.jit(impl)


def assemble_dense_device(op: NavierStokesOperator) -> jnp.ndarray:
    """Device-side :func:`assemble_dense`: element matrices, dense
    scatter and the CᵀAC constraint sandwich in ONE jitted dispatch —
    no element-matrix download (used by the GMG direct coarse solve,
    rebuilt every preconditioner refresh). Small problems only (the
    dense matrix lives on device)."""
    _ensure_emat_all(op)
    fn = getattr(op, "_dense_all", None)
    if fn is None:
        C = op.n_comp
        n = op.n_nodes * C
        gdofs = jnp.asarray(
            (np.asarray(op.batch.cell_nodes)[:, :, None] * C
             + np.arange(C)[None, None, :])
            .reshape(op.space.mesh.n_cells, -1).astype(np.int32)
        )
        sel = jnp.arange(op.space.mesh.n_cells, dtype=jnp.int32)

        def impl(jinv, jxw, cq, ca):
            emat = op._emat_all(jinv, jxw, cq, sel)
            A = jnp.zeros((n, n), op.dtype).at[
                gdofs[:, :, None], gdofs[:, None, :]
            ].add(emat)
            if ca is not None:
                rows, cols, wts = ca
                w = wts.astype(op.dtype)
                # A C: move constrained columns onto their masters
                contrib = A[:, rows]                      # (n, m)
                A = A.at[:, cols].add(contrib[:, :, None] * w[None])
                A = A.at[:, rows].set(0.0)
                # Cᵀ A: same on the row side
                contribR = A[rows, :]                     # (m, n)
                A = A.at[cols, :].add(w[:, :, None] * contribR[:, None, :])
                A = A.at[rows, :].set(0.0)
                A = A.at[rows, rows].set(1.0)
            return A

        fn = jax.jit(impl)
        op._dense_all = fn
    ca = op.constraints_homogeneous
    ca_t = (ca.rows, ca.cols, ca.weights) if ca.n else None
    return fn(op.batch.jinv, op.batch.jxw, _cq_cell_tree(op), ca_t)


def diagonal_kernel(op: NavierStokesOperator, chunk: int = 2048):
    """(jitted whole-mesh diagonal fn, current-args builder) — memoized
    on the operator. The fn composes inside outer jits (the GMG
    smoother-state refresh fuses every level's diagonal + omega into one
    dispatch)."""
    _ensure_diag_all(op, chunk)
    return op._diag_all, lambda: _diag_args(op)


def _diag_args(op):
    ca = op.constraints_homogeneous
    return (
        op.batch.jinv, op.batch.jxw, _cq_cell_tree(op),
        op.batch.cell_nodes, ca.rows if ca.n else None,
    )


def compute_diagonal(op: NavierStokesOperator, chunk: int = 2048) -> jnp.ndarray:
    """Diagonal of the (constrained) operator, shape (n_nodes, C).

    Constrained rows get 1.0.  (Approximation vs. deal.II's
    ``compute_diagonal``: contributions of constraint weights w_ri to
    unconstrained diagonal entries are dropped — exact for Dirichlet /
    pressure-pin constraints, approximate for slip/periodic rows; the
    Jacobi smoother tolerates this.)"""
    _ensure_diag_all(op, chunk)
    return op._diag_all(*_diag_args(op))


def _ensure_diag_all(op: NavierStokesOperator, chunk: int = 2048) -> None:
    n_loc = op.space.element.n_loc
    C = op.n_comp

    # memoize ONE jitted whole-mesh kernel on the operator (a fresh
    # jax.jit wrapper per call defeats the jit cache — every rebuild
    # paid a retrace+recompile, ~0.75 s/level/step). The chunk loop runs
    # INSIDE the jit as a rolled fori over dynamic slices (+ a static
    # tail), so one preconditioner rebuild issues ONE device dispatch
    # instead of ~4 eager ops per chunk (each a ~29 ms round trip on the
    # tunneled TPU), while per-chunk jacfwd intermediates keep memory
    # bounded and the HLO small.
    if getattr(op, "_diag_all", None) is None:
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
        ediag_v = jax.vmap(ediag, in_axes=(0, 0, cq_axes))
        n_c = op.space.mesh.n_cells
        n_full = n_c // chunk
        tail = n_c - n_full * chunk

        def impl(jinv, jxw, cq_all, cell_nodes, c_rows):
            def chunk_add(diag, lo, size):
                sl = lambda a: jax.lax.dynamic_slice_in_dim(a, lo, size, 0)
                cq = {
                    k: (v if k == "weight" else sl(v))
                    for k, v in cq_all.items()
                }
                d_loc = ediag_v(sl(jinv), sl(jxw), cq)
                return diag.at[sl(cell_nodes)].add(d_loc)

            diag = jnp.zeros((op.n_nodes, C), op.dtype)
            if n_full:
                diag = jax.lax.fori_loop(
                    0, n_full,
                    lambda i, d: chunk_add(d, i * chunk, chunk), diag,
                )
            if tail:
                diag = chunk_add(diag, n_full * chunk, tail)
            if c_rows is not None:
                diag = diag.reshape(-1).at[c_rows].set(1.0).reshape(
                    diag.shape
                )
            return diag

        op._diag_all = jax.jit(impl)


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
