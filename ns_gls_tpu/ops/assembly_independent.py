"""Independent quadrature-loop assembly of the GLS-stabilized NS system.

A second, independent discretization used purely as a correctness
cross-check of the matrix-free q-point kernel — the role of the
reference's ``NavierStokesOperatorMatrixBased`` assembly
(``operator_ns.cc:1600-1756``), which deliberately does NOT share code
with the matrix-free ``do_vmult_cell``.  This module is written directly
from the weak form (``doc/nse.tex`` equivalent; see doc/math.md):

Find (u, p) such that for all test functions (v, q):

  (v, w u + theta (grad u) u*)                      [time + convection]
  + (grad v, -p I + nu theta (grad u + grad u^T)
             + delta2 theta (div u) I)              [pressure/viscous/grad-div]
  + ((u* . grad) v, delta1 R(u, p))                 [SUPG]
  + (q, theta div u)                                [continuity]
  + (grad q, delta1 R(u, p))                        [PSPG]

with the strong momentum residual linearization
  R(u, p) = w u + theta grad p + theta (grad u) u*      (fixed-point form)

and, for the Newton increment form, additionally
  (v, (grad u*) u)  and the SUPG/PSPG second linearization direction
  R1 = w u* + dt_u_old + grad p* + (grad u*) u*   multiplied by u.

Everything here is plain NumPy with explicit loops over quadrature points
and local shape functions; only geometry tables (jinv, jxw) are shared
with the FESpace (geometry is data, not discretization).
"""

from __future__ import annotations

import numpy as np


def assemble_gls_matrix(
    op,
    u_lin: np.ndarray,
    vec_old: np.ndarray | None = None,
    increment_form: bool | None = None,
) -> "scipy.sparse.csr_matrix":
    """Assemble the linearized GLS system matrix around ``u_lin``.

    op: a NavierStokesOperator (used ONLY for parameters, the FESpace
    geometry tables, and the stabilization constants — not for any
    q-point physics code).
    Returns an (n_nodes*C, n_nodes*C) scipy CSR matrix of the raw
    (unconstrained) bilinear form.
    """
    import scipy.sparse as sp

    space = op.space
    d = space.dim
    C = d + 1
    el = space.element
    n_loc = el.n_loc
    n_q = el.n_q
    n_c = space.mesh.n_cells
    theta = op.theta
    nu = op.nu
    w = float(op.time_integrator.primary_weight)
    if increment_form is None:
        increment_form = op.increment_form

    S = np.asarray(el.tables[0], np.float64)   # (n_q, n_loc)
    D = np.asarray(el.tables[1], np.float64)   # (n_q, n_loc, d)
    jinv = np.asarray(space.jinv, np.float64)  # (n_c, n_q, d, d)
    jxw = np.asarray(space.jxw, np.float64)    # (n_c, n_q)
    cell_nodes = np.asarray(space.cell_nodes)

    # physical shape gradients: dphi[c, q, i, x] = sum_r D[q,i,r] jinv[c,q,r,x]
    dphi = np.einsum("qir,cqrx->cqix", D, jinv)

    # linearization tables at q points (independent evaluation)
    u_lin = np.asarray(u_lin, np.float64)
    u_loc = u_lin[cell_nodes]                          # (n_c, n_loc, C)
    u_star = np.einsum("qi,cia->cqa", S, u_loc[..., :d])
    grad_u_star = np.einsum("cqix,cia->cqax", dphi, u_loc[..., :d])
    grad_p_star = np.einsum("cqix,ci->cqx", dphi, u_loc[..., d])
    if vec_old is not None:
        vo_loc = np.asarray(vec_old, np.float64)[cell_nodes]
        dt_u_old = np.einsum("qi,cia->cqa", S, vo_loc[..., :d])
    else:
        dt_u_old = np.zeros_like(u_star)

    # stabilization parameters — recomputed independently from the formula
    # (reference compute_penalty_parameters, operator_ns.cc:357-420)
    tau = op.time_integrator.current_dt
    stau = 0.0 if tau == 0.0 else 1.0 / tau
    if op.cell_wise_stabilization:
        u_max = np.sqrt((u_star**2).sum(-1)).max(axis=1)      # (n_c,)
        h = np.asarray(space.cell_h_min_vertex, np.float64)
        visc = nu >= h
        d1 = np.where(
            visc, op.c_1 * h * h,
            op.c_1 / np.sqrt(stau**2 + u_max**2 / h**2),
        )[:, None] * np.ones((1, n_q))
        d2 = np.where(visc, op.c_2 * h * h, op.c_2 * h)[:, None] * np.ones(
            (1, n_q)
        )
    else:
        if space.dim == 2:
            hq = np.sqrt(4.0 * space.cell_measure / np.pi) / space.degree
        else:
            hq = np.cbrt(6.0 * space.cell_measure / np.pi) / space.degree
        u2 = 1e-12 + (u_star**2).sum(-1)                      # (n_c, n_q)
        h = hq[:, None]
        d1 = 1.0 / np.sqrt(
            stau**2 + 4.0 * u2 / h**2 + 9.0 * (4.0 * nu / h**2) ** 2
        )
        d2 = np.sqrt(u2) * h * 0.5

    consider_dt = op.consider_time_derivative
    w_eff = w if consider_dt else 0.0

    # element matrices, vectorized over cells and q; explicit loops over
    # (i, j) test/trial pairs and (a, b) component pairs
    A_el = np.zeros((n_c, n_loc, C, n_loc, C))

    # convective derivative of shape functions: (u*.grad) phi_j
    adv = np.einsum("cqjx,cqx->cqj", dphi, u_star)           # (n_c, n_q, j)
    # Newton extra: (grad u*) acting on trial velocity
    # and the SUPG second direction R1 = w u* + dt_u_old + grad p* + (grad u*) u*
    if increment_form:
        R1 = (
            (w_eff * u_star if consider_dt else 0.0 * u_star)
            + (dt_u_old if consider_dt else 0.0 * dt_u_old)
            + grad_p_star
            + np.einsum("cqax,cqx->cqa", grad_u_star, u_star)
        )

    jq = jxw  # (n_c, n_q)

    for q in range(n_q):
        Sq = S[q]                    # (n_loc,)
        Dq = dphi[:, q]              # (n_c, i, x)
        Jq = jq[:, q][:, None, None]
        d1q = d1[:, q][:, None, None]
        d2q = d2[:, q][:, None, None]
        advq = adv[:, q]             # (n_c, j)
        usq = u_star[:, q]           # (n_c, x)
        gusq = grad_u_star[:, q]     # (n_c, a, x)

        phi_i_phi_j = Sq[:, None] * Sq[None, :]              # (i, j)
        # scalar blocks reused below
        grad_dot = np.einsum("cix,cjx->cij", Dq, Dq)         # grad phi_i . grad phi_j

        # ---- velocity-velocity, diagonal (delta_ab) part
        # Galerkin mass always carries the primary weight w; only the
        # SUPG/PSPG strong residual gates on `consider time derivative`
        # (matches qpoint_fixed_point: val_res_u vs pspg)
        vv_iso = (
            w * phi_i_phi_j[None, :, :]
            + theta * Sq[None, :, None] * advq[:, None, :]
            + nu * theta * grad_dot
            + d1q * advq[:, :, None] * (
                w_eff * Sq[None, None, :] + theta * advq[:, None, :]
            )
        ) * Jq
        # ---- velocity-velocity, (a, b) coupled parts
        for a in range(d):
            for b in range(d):
                blk = (
                    nu * theta * np.einsum("ci,cj->cij", Dq[:, :, b], Dq[:, :, a])
                    + d2q * theta * np.einsum(
                        "ci,cj->cij", Dq[:, :, a], Dq[:, :, b]
                    )
                ) * Jq
                if a == b:
                    blk = blk + vv_iso
                if increment_form:
                    # Galerkin Newton term (v, (grad u*) u):
                    # phi_i * gusq[a, b] * phi_j
                    blk = blk + (
                        gusq[:, a, b][:, None, None] * phi_i_phi_j[None]
                    ) * Jq
                    # SUPG linearized directions:
                    # residual_0 gains (grad u*) u -> tested by (u*.grad)v
                    blk = blk + (
                        d1q * advq[:, :, None]
                        * gusq[:, a, b][:, None, None] * Sq[None, None, :]
                    ) * Jq
                    # residual_1 x u term: R1_a phi_j * (grad v: row a gets
                    # sum_x R1_a u_b d_b v_a? -> grad_res_u += R1[:,None]*u[None,:]
                    # tested: sum_ab R1_a u_b d_b v_a = (u . grad) v . R1
                    blk = blk + (
                        d1q
                        * Dq[:, :, b][:, :, None]
                        * R1[:, q, a][:, None, None]
                        * Sq[None, None, :]
                    ) * Jq
                A_el[:, :, a, :, b] += blk

        # ---- velocity-pressure (a < d trial p): -(div v, p) + SUPG theta grad p
        for a in range(d):
            vp = (
                -np.einsum("ci,j->cij", Dq[:, :, a], Sq)
                + d1q * theta * advq[:, :, None] * Dq[:, :, a][:, None, :]
            ) * Jq
            A_el[:, :, a, :, d] += vp

        # ---- pressure-velocity (q test, b trial u): (q, theta div u) + PSPG
        for b in range(d):
            pv = (
                theta * np.einsum("i,cj->cij", Sq, Dq[:, :, b])
                + d1q * Dq[:, :, b][:, :, None] * (
                    w_eff * Sq[None, None, :] + theta * advq[:, None, :]
                )
            ) * Jq
            if increment_form:
                # residual_0 gains (grad u*) u, tested against grad q:
                # sum_a d_a phi_i * gusq[a, b] * phi_j
                pv = pv + (
                    d1q
                    * np.einsum("cia,ca->ci", Dq, gusq[:, :, b])[:, :, None]
                    * Sq[None, None, :]
                ) * Jq
            A_el[:, :, d, :, b] += pv

        # ---- pressure-pressure: PSPG grad q . grad p (note: the PSPG row
        # uses the UNscaled pressure gradient — qpoint_fixed_point's
        # grad_res_p carries p_grad, not theta*p_grad, while the SUPG row
        # carries theta*p_grad; the independent assembly reproduces that)
        A_el[:, :, d, :, d] += (d1q * grad_dot) * Jq

    # scatter to global COO
    gdofs = cell_nodes[:, :, None] * C + np.arange(C)[None, None, :]
    gdofs = gdofs.reshape(n_c, n_loc * C)
    rows = np.repeat(gdofs, n_loc * C, axis=1).reshape(-1)
    cols = np.tile(gdofs, (1, n_loc * C)).reshape(-1)
    vals = A_el.reshape(n_c, n_loc * C, n_loc * C).reshape(-1)
    n = space.n_nodes * C
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    A.sum_duplicates()
    return A
