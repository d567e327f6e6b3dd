"""Structured-lattice fused GLS sweep (Pallas, the TPU fast path).

On a structured patch (``FESpace.structured``) the FE gather/scatter is
pure lattice indexing, so the whole operator apply — gather, sum-
factorized evaluate, q-point GLS physics, integrate, scatter — fuses into
ONE Pallas kernel with zero index traffic (the TPU re-design of the
reference's ``do_vmult_cell`` sweep, ``operator_ns.cc:949-1182``):

- the FESpace numbers lattice nodes x-innermost with y/z grouped by
  residue class mod degree, so every sum-factorization "unfold" is a
  static CONTIGUOUS slice and every "fold" (overlap-add) is a concat —
  no strided memory access anywhere,
- the x-axis contraction is a banded MXU matmul per component/plane
  (band ``B[P ex + i, qx nx + ex] = S1[qx, i]`` — gather, basis weighting
  and, transposed, overlap-add in one matmul),
- in 3D the y-axis contraction is a second banded MXU matmul
  (``By[qy ny + ey, yrow(ey, j)] = S1[qy, j]``), so only the (P+1)-term
  z contraction runs as scalar-weighted VPU sums — the MXU (otherwise
  idle during q-point physics) absorbs the interpolation work,
- the z overlap between slabs is handled by passing the solution array
  once per local plane with shifted BlockSpec index maps (the pipeline
  prefetches each plane; neighboring slabs share one class-0 plane),
- q-point physics runs on ``(NQ*ny, NQ*nx)`` tiles — cells on lanes, the
  TPU analogue of the reference's ``VectorizedArray`` cell batching,
- stabilization delta1/delta2 is recomputed in-kernel from the
  linearization velocity (``compute_penalty_parameters``,
  ``operator_ns.cc:357-420``),
- slab-boundary output planes are emitted separately per slab and summed
  in XLA (tiny), keeping the kernel scatter-free.

Supported: dim 2/3, any degree, affine cells, BDF/stationary (theta=1),
cell- or q-wise stabilization, fixed-point / Newton-increment / residual
flavors, f32. Anything else falls back to the general sweep.
"""

from __future__ import annotations

from typing import NamedTuple

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class StructuredTables(NamedTuple):
    """Device tables (lattice cell order, lanes pre-tiled to (qx, nx)).

    3D cell-table rows are pre-tiled to (qy, ny); 2D rows have extent 1.
    """

    band_S: jnp.ndarray   # (Nx, NQ*nx)
    band_D: jnp.ndarray   # (Nx, NQ*nx)
    band_Sy: jnp.ndarray  # 3D: (NQ*ny, Yr); 2D: (1, 1) dummy
    band_Dy: jnp.ndarray  # 3D: (NQ*ny, Yr); 2D: (1, 1) dummy
    S1: jnp.ndarray       # (NQ, P+1)  (SMEM)
    D1: jnp.ndarray       # (NQ, P+1)  (SMEM)
    jinv: jnp.ndarray     # (d*d, n_slabs, R, NQ*nx)   R = NQ*ny | 1
    jxw: jnp.ndarray      # (NQ^(3-d+...): 3D NQ, 2D NQ, n_slabs, R, NQ*nx)
    h: jnp.ndarray        # (2, n_slabs, R, NQ*nx)
    bdy: tuple = ()       # 3D batched kernel: (BD_S, BD_D, BD_S^T, BD_D^T)
    #                       component-block-diagonal y bands on
    #                       (C*NQ*ny, C*Yp) with Yp = Yr padded to 8


def _class_offsets(P: int, n: int) -> dict:
    """Row offset of residue class k in the class-grouped axis layout
    (classes 1..P-1 of n rows each, then class 0 of n+1 rows)."""
    return {k: ((k - 1) * n if k >= 1 else (P - 1) * n) for k in range(P)}


def build_structured_tables(op) -> StructuredTables | None:
    """Host-side packing; None when the operator/space is unsupported."""
    space = op.space
    if not getattr(space, "structured", False):
        return None
    if not op.affine_geometry or op.theta != 1.0:
        return None
    if op.dtype != jnp.float32:
        return None
    d = space.dim
    if d not in (2, 3):
        return None

    from ns_gls_tpu.fem.lagrange import (
        eval_lagrange,
        gauss_lobatto_points_1d,
        gauss_points_1d,
    )

    P = space.degree
    NQ = space.n_q1d
    cs = space.cell_shape            # (nx, ny[, nz])
    nx = cs[0]
    Nx = P * nx + 1
    L = NQ * nx

    nodes = gauss_lobatto_points_1d(P + 1)
    qpts, _ = gauss_points_1d(NQ)
    S1, D1 = eval_lagrange(tuple(nodes), np.asarray(qpts))  # (NQ, P+1)

    band_S = np.zeros((Nx, L), np.float32)
    band_D = np.zeros((Nx, L), np.float32)
    for ex in range(nx):
        for i in range(P + 1):
            for qx in range(NQ):
                band_S[P * ex + i, qx * nx + ex] = S1[qx, i]
                band_D[P * ex + i, qx * nx + ex] = D1[qx, i]

    if d == 3:
        # y band in the class-grouped row order: local y node j of cell ey
        # lives at class-grouped row  yoff[j % P] + ey + (j == P)
        ny = cs[1]
        Yr = P * ny + 1
        yoff = _class_offsets(P, ny)
        band_Sy = np.zeros((NQ * ny, Yr), np.float32)
        band_Dy = np.zeros((NQ * ny, Yr), np.float32)
        for ey in range(ny):
            for j in range(P + 1):
                r = yoff[j % P] + ey + (1 if j == P else 0)
                for qy in range(NQ):
                    band_Sy[qy * ny + ey, r] = S1[qy, j]
                    band_Dy[qy * ny + ey, r] = D1[qy, j]
        C = d + 1
        Yp = -(-Yr // 8) * 8
        bdy_S = np.zeros((C * NQ * ny, C * Yp), np.float32)
        bdy_D = np.zeros((C * NQ * ny, C * Yp), np.float32)
        for c in range(C):
            bdy_S[c * NQ * ny:(c + 1) * NQ * ny,
                  c * Yp:c * Yp + Yr] = band_Sy
            bdy_D[c * NQ * ny:(c + 1) * NQ * ny,
                  c * Yp:c * Yp + Yr] = band_Dy
        bdy = (bdy_S, bdy_D, bdy_S.T.copy(), bdy_D.T.copy())
    else:
        band_Sy = np.zeros((1, 1), np.float32)
        band_Dy = np.zeros((1, 1), np.float32)
        bdy = tuple(np.zeros((1, 1), np.float32) for _ in range(4))

    # cells in (slab-major, y, x) order: slabs are z layers (3D) or y rows
    # (2D, degenerate per-slab y extent 1)
    lat = space.mesh.lattice
    perm = np.lexsort(tuple(lat[:, k] for k in range(d)))
    if d == 3:
        cshape = (cs[2], cs[1], nx)   # (nz, ny, nx)
        row_rep = NQ                  # rows pre-tiled over qy
    else:
        cshape = (cs[1], 1, nx)       # (ny, 1, nx)
        row_rep = 1

    def pack_cell(arr):
        """(n_c,) or (n_c, m) mesh order -> (m, n_slabs, R, L)."""
        a = np.asarray(arr)[perm]
        if a.ndim == 1:
            a = a[:, None]
        a = a.reshape(cshape + (a.shape[1],))
        a = np.moveaxis(a, -1, 0)
        return np.tile(a, (1, 1, row_rep, NQ)).astype(np.float32)

    jinvP = pack_cell(
        np.asarray(space.jinv)[:, 0].reshape(space.mesh.n_cells, d * d)
    )

    # jxw: element q index = qx + NQ*qy (+ NQ^2*qz); lanes hold (qx, nx);
    # 3D rows hold (qy, ny); the leading dim enumerates qz (3D) / qy (2D)
    jxw = np.asarray(space.jxw)[perm]            # (n_c, n_q)
    if d == 3:
        jxwP = np.zeros((NQ, cshape[0], NQ * cshape[1], L), np.float32)
        for qz in range(NQ):
            for qy in range(NQ):
                for qx in range(NQ):
                    q = qx + NQ * qy + NQ * NQ * qz
                    jxwP[qz, :, qy * cshape[1]:(qy + 1) * cshape[1],
                         qx * nx:(qx + 1) * nx] = jxw[:, q].reshape(cshape)
    else:
        jxwP = np.zeros((NQ, cshape[0], 1, L), np.float32)
        for qy in range(NQ):
            for qx in range(NQ):
                q = qx + NQ * qy
                jxwP[qy, :, :, qx * nx:(qx + 1) * nx] = jxw[:, q].reshape(
                    cshape
                )

    h1 = np.asarray(space.cell_h_min_vertex)
    if d == 2:
        hq = np.sqrt(4.0 * space.cell_measure / np.pi) / P
    else:
        hq = np.cbrt(6.0 * space.cell_measure / np.pi) / P
    hP = pack_cell(np.stack([h1, hq], axis=1))

    return StructuredTables(
        band_S=jnp.asarray(band_S),
        band_D=jnp.asarray(band_D),
        band_Sy=jnp.asarray(band_Sy),
        band_Dy=jnp.asarray(band_Dy),
        S1=jnp.asarray(S1.astype(np.float32)),
        D1=jnp.asarray(D1.astype(np.float32)),
        jinv=jnp.asarray(jinvP),
        jxw=jnp.asarray(jxwP),
        h=jnp.asarray(hP),
        bdy=tuple(jnp.asarray(b) for b in bdy),
    )


# ---------------------------------------------------------------------------
# q-point physics on tiles (mirrors qpoint_fixed_point / qpoint_increment,
# which mirror operator_ns.cc:949-1182)
# ---------------------------------------------------------------------------
def _physics(d, flavor, sc, u_val, u_grad, p_val, p_grad,
             u_star, gus, gps, dt_old, d1, d2, consider_dt):
    w = sc["weight"]
    nu = sc["nu"]

    if os.environ.get("NS_PROF_PHYS") == "0":
        # profiling mode: passthrough instead of the GLS q-point algebra
        # (tools/profile_apply.py --split measures the kernel's MXU +
        # interpolation share; the delta vs the full kernel is the VPU
        # physics share).  Zero-weight consumers keep every operand live
        # so XLA cannot DCE the interpolation passes being measured.
        z = 0.0 * (d1 + d2)
        for t in (u_star[0], (dt_old[0] if dt_old is not None else d1),
                  (gus[0][0] if gus is not None else d1),
                  (gps[0] if gps is not None else d1)):
            z = z + 0.0 * t
        val_res = [u_val[a] + z for a in range(d)] + [p_val + z]
        grad_res = [[u_grad[a][x] for x in range(d)] for a in range(d)]
        grad_res += [[p_grad[x] for x in range(d)]]
        return val_res, grad_res

    if flavor in ("fixed", "residual"):
        residual = flavor == "residual"
        u_dt = [w * u_val[a] for a in range(d)]
        if residual and dt_old is not None:
            u_dt = [u_dt[a] + dt_old[a] for a in range(d)]
        div = sum(u_grad[a][a] for a in range(d))
        sgb = [sum(u_grad[a][b] * u_star[b] for b in range(d))
               for a in range(d)]
        val_res_u = [u_dt[a] + sgb[a] for a in range(d)]
        pspg = u_dt if consider_dt else [0.0 * u_dt[a] for a in range(d)]
        res0 = [d1 * (pspg[a] + p_grad[a] + sgb[a]) for a in range(d)]
        grad_res_u = [
            [
                nu * (u_grad[a][x] + u_grad[x][a])
                + res0[a] * u_star[x]
                + ((d2 * div - p_val) if a == x else 0.0)
                for x in range(d)
            ]
            for a in range(d)
        ]
        return val_res_u + [div], grad_res_u + [res0]

    # Newton increment flavor
    u_dt = [w * u_val[a] for a in range(d)]
    div = sum(u_grad[a][a] for a in range(d))
    sgu = [sum(u_grad[a][b] * u_star[b] for b in range(d)) for a in range(d)]
    ugs = [sum(gus[a][b] * u_val[b] for b in range(d)) for a in range(d)]
    sgs = [sum(gus[a][b] * u_star[b] for b in range(d)) for a in range(d)]
    val_res_u = [u_dt[a] + sgu[a] + ugs[a] for a in range(d)]
    if consider_dt:
        pspg0 = u_dt
        pspg1 = [w * u_star[a] + dt_old[a] for a in range(d)]
    else:
        pspg0 = [0.0 * u_dt[a] for a in range(d)]
        pspg1 = pspg0
    res0 = [d1 * (pspg0[a] + p_grad[a] + sgu[a] + ugs[a]) for a in range(d)]
    res1 = [d1 * (pspg1[a] + gps[a] + sgs[a]) for a in range(d)]
    grad_res_u = [
        [
            nu * (u_grad[a][x] + u_grad[x][a])
            + res0[a] * u_star[x]
            + res1[a] * u_val[x]
            + ((d2 * div - p_val) if a == x else 0.0)
            for x in range(d)
        ]
        for a in range(d)
    ]
    return val_res_u + [div], grad_res_u + [res0]


def _delta(sc, h1, hq, usq_max, usq_q, cell_wise):
    stau = sc["stau"]
    nu = sc["nu"]
    c1 = sc["c1"]
    c2 = sc["c2"]
    if cell_wise:
        d1_adv = c1 * jax.lax.rsqrt(stau * stau + usq_max / (h1 * h1))
        visc = nu >= h1
        d1 = jnp.where(visc, c1 * h1 * h1, d1_adv)
        d2 = jnp.where(visc, c2 * h1 * h1, c2 * h1)
        return d1, d2
    u2 = 1e-12 + usq_q
    d1 = jax.lax.rsqrt(stau * stau + 4.0 * u2 / (hq * hq)
                       + 9.0 * (4.0 * nu / (hq * hq)) ** 2)
    d2 = jnp.sqrt(u2) * hq * 0.5
    return d1, d2



def _pad_rows_to(a, n):
    """Zero-pad a 2D array's row extent to n (for shared band operands
    whose contraction axis was lane-padded on the other side).

    Static concat, NOT ``.at[:].set`` — the latter lowers to a
    ``scatter`` primitive that Mosaic's Pallas TPU backend rejects
    (first observed on the real chip, round 4)."""
    if a.shape[0] == n:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((n - a.shape[0], a.shape[1]), a.dtype)], axis=0
    )


def _lane_cat(tiles, w):
    """Concatenate 2D tiles along lanes at 128-aligned offsets w.

    Static lane-pad + concat, NOT ``dynamic_update_slice`` into zeros —
    Mosaic's Pallas TPU backend implements neither ``scatter`` nor
    ``dynamic_update_slice`` (first observed on the real chip, round 4);
    concatenate of statically-sliced tiles lowers fine."""
    padded = []
    for t in tiles:
        if t.shape[1] != w:
            t = jnp.concatenate(
                [t, jnp.zeros((t.shape[0], w - t.shape[1]), t.dtype)],
                axis=1,
            )
        padded.append(t)
    return jnp.concatenate(padded, axis=1)


def _lane_to_rows(big, nb, w):
    """(r, nb*w) lane blocks -> (nb*r8, w) row blocks (layout-preserving
    tile copies; keeps wide-matmul outputs consumable by a second wide
    matmul on the other axis). Static slices + one concat — see
    ``_lane_cat`` for why no dynamic_update_slice.

    Each block is row-padded to r8 = ceil(r/8)*8 so every block starts
    at a sublane-aligned offset: Mosaic refuses to concatenate tiles
    whose SUBLANE offsets differ ("result/input offset mismatch on
    non-concat dimension", first observed at the Turek ref-1 shapes
    where blk = 78), and downstream row slices at non-8-multiples would
    carry those offsets into later lane concats.  The pad rows are zero
    and the MXU pads to 8 sublanes anyway — no extra cost."""
    r = big.shape[0]
    r8 = -(-r // 8) * 8
    blocks = [big[:, j * w:(j + 1) * w] for j in range(nb)]
    if r8 != r:
        z = jnp.zeros((r8 - r, w), big.dtype)
        blocks = [jnp.concatenate([b, z], axis=0) for b in blocks]
    return jnp.concatenate(blocks, axis=0)


def _unstack_rows(M, lead, n_pl, blk):
    """(lead*n_pl*blk8, L) row blocks -> [comp][plane] (blk, L) slices.

    The row stride is derived from M (blocks may be sublane-padded by
    ``_lane_to_rows``); slices start at multiples of the padded stride,
    so they keep sublane offset 0."""
    stride = M.shape[0] // (lead * n_pl)
    return [
        [M[(c * n_pl + k) * stride:(c * n_pl + k) * stride + blk]
         for k in range(n_pl)]
        for c in range(lead)
    ]


def _wide_fwd(tiles, lead, n_pl, w, l1, l2, r1, r2, grads, split, mm, blk):
    """Shared wide-batching forward schedule (structured 3D + prism):
    lane-concat all (comp, plane) tiles at 128-aligned offsets w, apply
    the shared-LEFT band once, restack lanes to rows (layout-preserving
    tile copies), then each shared-RIGHT band once — identical FLOPs to
    the per-(comp, plane) loop, ~lead*n_pl fewer MXU issues (the kernels
    are issue-latency-bound).

    Returns (A, B, Cg): A = (l1, r1) base, B = (l1, r2), Cg = (l2, r1),
    each as [comp][plane] (blk, L) row slices; B/Cg None unless grads."""
    nb = lead * n_pl
    Ts = split(_lane_cat(tiles, w))
    X1 = mm(l1, Ts)
    RS = split(_lane_to_rows(X1, nb, w))
    A = _unstack_rows(mm(RS, r1), lead, n_pl, blk)
    if not grads:
        return A, None, None
    B = _unstack_rows(mm(RS, r2), lead, n_pl, blk)
    X2 = mm(l2, Ts)
    Cg = _unstack_rows(
        mm(split(_lane_to_rows(X2, nb, w)), r1), lead, n_pl, blk
    )
    return A, B, Cg


def _wide_fwd_merged(tiles, lead, n_pl, w, l12, r1, r2, grads, split, mm,
                     blk, q8):
    """``_wide_fwd`` with the S/D band pass-pairs merged — identical
    FLOPs, ~40% fewer MXU issues (measured: the wide kernels are
    MXU-pass-bound, PERF.md r5):

    - the two shared-LEFT passes (S and D bands) run as ONE matmul on
      the row-stacked band ``l12 = [l1; l2]`` (rows padded to q8 so the
      result row-split stays sublane-aligned),
    - the two shared-RIGHT r1 applications (the (X1, X2) pair) run as
      ONE matmul on row-stacked operands (exact — separate rows)."""
    nb = lead * n_pl
    Ts = split(_lane_cat(tiles, w))
    X12 = mm(l12, Ts)                          # (2*q8, nb*w)
    X1 = X12[0:q8]
    if not grads:
        RS = split(_lane_to_rows(X1, nb, w))
        A = _unstack_rows(mm(RS, r1), lead, n_pl, blk)
        return A, None, None
    X2 = X12[q8:2 * q8]
    R1 = _lane_to_rows(X1, nb, w)
    R2 = _lane_to_rows(X2, nb, w)
    B = _unstack_rows(mm(split(R1), r2), lead, n_pl, blk)
    AC = mm(split(jnp.concatenate([R1, R2], axis=0)), r1)
    half = AC.shape[0] // 2
    A = _unstack_rows(AC[0:half], lead, n_pl, blk)
    Cg = _unstack_rows(AC[half:2 * half], lead, n_pl, blk)
    return A, B, Cg


def _wide_adjoint_merged(acc_a, acc_b, acc_c, C, n_pl, w, l12T, l1T,
                         r12T, split, mm, blk, q8):
    """``_wide_adjoint`` with the pass-pairs merged along the
    CONTRACTION dim — exact (the merged matmul computes the same sum):

    - ``FS = l1T @ A + l2T @ B`` as ``[l1T | l2T] @ [A; B]``
      (``l12T``, accumulator rows padded to q8),
    - ``OUT = FSr @ r1T + FDr @ r2T`` as ``[FSr | FDr] @ [r1T; r2T]``
      (``r12T``; the lane offset w is 128-aligned by construction)."""
    nb2 = C * n_pl

    def rawcat(acc):
        return _pad_rows_to(_lane_cat(
            [acc[c][k] for c in range(C) for k in range(n_pl)], w
        ), q8)

    FS = mm(l12T, split(jnp.concatenate(
        [rawcat(acc_a), rawcat(acc_b)], axis=0
    )))
    FD = mm(l1T, split(rawcat(acc_c)))
    FSr = _lane_to_rows(FS, nb2, w)
    FDr = _lane_to_rows(FD, nb2, w)
    OUT = mm(split(jnp.concatenate([FSr, FDr], axis=1)), r12T)
    return _unstack_rows(OUT, C, n_pl, blk)


def _wide_adjoint(acc_a, acc_b, acc_c, C, n_pl, w, l1T, l2T, r1T, r2T,
                  split, mm, blk):
    """Shared wide-batching adjoint fold: the transposed-band overlap-add
    of the accumulators, as two wide matmuls per band pair.
    acc_a/acc_b fold through (l1T, l2T) into the r1T band; acc_c folds
    through l1T into the r2T band. Returns [comp][plane] (blk, Nn)."""
    nb2 = C * n_pl
    cat = lambda acc: split(_lane_cat(
        [acc[c][k] for c in range(C) for k in range(n_pl)], w
    ))
    FS = mm(l1T, cat(acc_a)) + mm(l2T, cat(acc_b))
    FD = mm(l1T, cat(acc_c))
    OUT = mm(split(_lane_to_rows(FS, nb2, w)), r1T) + mm(
        split(_lane_to_rows(FD, nb2, w)), r2T
    )
    return _unstack_rows(OUT, C, n_pl, blk)


def _mm_tools(mode: str):
    """In-kernel matmul tools at the requested accuracy/cost point.

    Returns (split, mm, splitb): ``split(a)`` preprocesses a DATA
    operand once (so reused operands — each forward tensor — pay the
    decomposition once per slab instead of once per dot), ``splitb(b)``
    preprocesses a loop-invariant BAND operand (the 1D basis matrices),
    and ``mm(A, B)`` contracts two preprocessed operands.

    - "full":  Precision.HIGHEST (6 bf16 MXU passes) — exact f32.
    - "3x":    manual bf16x3 decomposition (3 DEFAULT passes): bf16
      hi/lo split of both operands, dropping only the lo*lo term
      (~2^-32 relative) — f32-grade accuracy at half the passes of
      HIGHEST. The kernel is MXU-pass-bound (round-2 probe: 576 us at
      HIGHEST vs 222 us at DEFAULT per apply).
    - "2x":    bf16x2 with bf16-ROUNDED bands: ``splitb`` snaps the
      band operand to its bf16 value (no lo term exists), so every dot
      is hi_a*B + lo_a*B — 2 passes, and each product is EXACT.  The
      applied operator is a FIXED perturbation J~ of the Jacobian
      (||dJ||/||J|| ~ 2^-9 per band application): still exactly linear
      in the input to f32 accumulation, so Krylov identities hold —
      unlike per-entry bf16 rounding (NS_JAC_PREC=bf16), whose ~4e-3
      nonlinear matvec noise measurably thrashes GMRES.  Valid ONLY for
      the Jacobian of an outer iteration whose convergence test uses
      the exact residual (Newton; the reference's own frozen-tau
      Jacobian, ``operator_ns.cc:949-1182``, is a far larger
      perturbation) — NOT for Picard/linearized solves, whose converged
      solution inherits operator error.
    - "bf16":  one DEFAULT pass — for operators that only ever run as
      preconditioner components (GMG level smoothers)."""
    if mode not in ("3x", "2x"):
        prec = (jax.lax.Precision.HIGHEST if mode == "full"
                else jax.lax.Precision.DEFAULT)

        def split(a):
            return a

        def mm(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32,
                           precision=prec)

        return split, mm, split

    def d1p(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)

    def split(a):
        hi = a.astype(jnp.bfloat16).astype(jnp.float32)
        return (hi, a - hi)

    if mode == "2x":
        def splitb(b):
            return (b.astype(jnp.bfloat16).astype(jnp.float32), None)
    else:
        splitb = split

    def mm(a, b):
        t = d1p(a[0], b[0])
        if a[1] is not None:
            t = t + d1p(a[1], b[0])
        if b[1] is not None:
            t = t + d1p(a[0], b[1])
        return t

    return split, mm, splitb


# ---------------------------------------------------------------------------
# the 3D kernel: grid over z-cell layers; x and y contractions on the MXU
# (banded matmuls), z contraction as (P+1)-term scalar-weighted sums
# ---------------------------------------------------------------------------
def _make_kernel_3d(dims, flavor, consider_dt, cell_wise, prec_mode,
                    wide=False, qz_stack=False):
    d = 3
    P = dims["P"]
    NQ = dims["NQ"]
    nx = dims["nx"]
    ny = dims["ny"]
    C = dims["C"]
    diag = dims.get("diag", False)
    need_lin_grads = flavor == "increment"
    need_dt_old = consider_dt and flavor in ("increment", "residual")
    n_pl = P + 1
    lead_ul = C if need_lin_grads else d

    def kernel(*refs):
        it = iter(refs)
        scal_ref = next(it)
        s1_ref = next(it)
        d1t_ref = next(it)
        bs_ref = next(it)
        bd_ref = next(it)
        bys_ref = next(it)
        byd_ref = next(it)
        _bdy = [next(it) for _ in range(4)]
        jinv_ref = next(it)
        jxw_ref = next(it)
        h_ref = next(it)
        u_refs = [next(it) for _ in range(n_pl)]
        ul_refs = [next(it) for _ in range(n_pl)]
        vo_refs = [next(it) for _ in range(n_pl)]
        outA_ref = next(it)
        outB_ref = next(it)

        sc = dict(
            weight=scal_ref[0, 0], stau=scal_ref[1, 0], nu=scal_ref[2, 0],
            c1=scal_ref[3, 0], c2=scal_ref[4, 0],
        )
        split, mm, splitb = _mm_tools(prec_mode)
        bs = splitb(bs_ref[:])
        bd = splitb(bd_ref[:])
        bys = splitb(bys_ref[:])
        byd = splitb(byd_ref[:])
        bsT = splitb(bs_ref[:].T)
        bdT = splitb(bd_ref[:].T)
        bysT = splitb(bys_ref[:].T)
        bydT = splitb(byd_ref[:].T)
        jinvL = [jinv_ref[r, 0] for r in range(9)]    # (NQ*ny, L)
        h1 = h_ref[0, 0]
        hq = h_ref[1, 0]

        # -- wide-batching geometry (see _fwd_wide/adjoint below) -------
        Nx, L = bs_ref.shape
        Q, Yr = bys_ref.shape
        NxP = -(-Nx // 128) * 128
        LP = -(-L // 128) * 128

        # NS_WIDE_MERGE=1: S/D pass-pairs as single stacked matmuls —
        # measured NEGATIVE on chip (3183 vs 3290 MDoF/s, r5): the wide
        # kernel is MXU-THROUGHPUT-bound at its K=65..128 shapes (time
        # scales with bf16 pass count: 205/334/493 us at 1/3/6 passes),
        # not issue-bound, so merging only adds concat copies. Kept for
        # re-evaluation on hardware with different issue cost.
        merge = wide and os.environ.get("NS_WIDE_MERGE", "0") == "1"
        if wide:
            bs_p = splitb(_pad_rows_to(bs_ref[:], NxP))    # (NxP, L)
            bd_p = splitb(_pad_rows_to(bd_ref[:], NxP))
            bsT_p = splitb(_pad_rows_to(bs_ref[:].T, LP))  # (LP, Nx)
            bdT_p = splitb(_pad_rows_to(bd_ref[:].T, LP))
        if merge:
            # merged-pass band operands (see _wide_fwd_merged /
            # _wide_adjoint_merged): S/D row-stacked y band, lane-stacked
            # y-band transposes, row-stacked x-band transposes
            q8 = -(-Q // 8) * 8
            bysd = splitb(jnp.concatenate(
                [_pad_rows_to(bys_ref[:], q8),
                 _pad_rows_to(byd_ref[:], q8)], axis=0
            ))
            bysT_q = splitb(_lane_cat([bys_ref[:].T], q8))
            bysdT = splitb(jnp.concatenate(
                [_lane_cat([bys_ref[:].T], q8),
                 _lane_cat([byd_ref[:].T], q8)], axis=1
            ))
            bsdT_p = splitb(jnp.concatenate(
                [_pad_rows_to(bs_ref[:].T, LP),
                 _pad_rows_to(bd_ref[:].T, LP)], axis=0
            ))

        def fwd_wide(plane_refs, lead, grads):
            """Wide-batched forward (see _wide_fwd): y band shared-left,
            x band shared-right, all (comp, plane) tiles at once; unlike
            the block-diagonal batching (kept below, measured slower)
            this wastes no multiplies on structural zeros."""
            tiles = [
                plane_refs[k][c, 0] for c in range(lead)
                for k in range(n_pl)
            ]
            if merge and grads:
                return _wide_fwd_merged(tiles, lead, n_pl, NxP, bysd,
                                        bs_p, bd_p, grads, split, mm, Q,
                                        q8)
            return _wide_fwd(tiles, lead, n_pl, NxP, bys, byd, bs_p, bd_p,
                             grads, split, mm, Q)

        def fwd_narrow(plane_refs, lead, grads):
            """Per (comp, plane) xy-banded tensors on (NQ*ny, L):
            A = val base, B = x-deriv base, Cg = y-deriv base."""
            A = [[None] * n_pl for _ in range(lead)]
            B = [[None] * n_pl for _ in range(lead)] if grads else None
            Cg = [[None] * n_pl for _ in range(lead)] if grads else None
            for c in range(lead):
                for k in range(n_pl):
                    t = split(plane_refs[k][c, 0])   # (Yr, Nx)
                    tx = split(mm(t, bs))            # (Yr, L)
                    A[c][k] = mm(bys, tx)            # (NQ*ny, L)
                    if grads:
                        B[c][k] = mm(bys, split(mm(t, bd)))
                        Cg[c][k] = mm(byd, tx)
            return A, B, Cg

        fwd = fwd_wide if wide else fwd_narrow

        UA, UB, UC = fwd(u_refs, C, True)
        ULA, ULB, ULC = fwd(ul_refs, lead_ul, need_lin_grads)
        VOA = fwd(vo_refs, d, False)[0] if need_dt_old else None

        def zsum(planes, qz, tab):
            acc = None
            for k in range(n_pl):
                t = tab[qz, k] * planes[k]
                acc = t if acc is None else acc + t
            return acc

        # u* values and |u*|^2 at every qz (tiles cover all (qy, qx))
        ustar = [
            [zsum(ULA[a], qz, s1_ref) for a in range(d)] for qz in range(NQ)
        ]
        usq = [sum(u * u for u in us) for us in ustar]

        if cell_wise:
            m = usq[0]
            for qz in range(1, NQ):
                m = jnp.maximum(m, usq[qz])
            # max over the qy row blocks, then the qx lane blocks
            mr = None
            for qy in range(NQ):
                sl = m[qy * ny:(qy + 1) * ny]
                mr = sl if mr is None else jnp.maximum(mr, sl)
            mx = None
            for qx in range(NQ):
                sl = mr[:, qx * nx:(qx + 1) * nx]
                mx = sl if mx is None else jnp.maximum(mx, sl)
            # broadcast back to (NQ*ny, L)
            row = jnp.concatenate([mx] * NQ, axis=1) if NQ > 1 else mx
            msq = jnp.concatenate([row] * NQ, axis=0) if NQ > 1 else row
            d1_t, d2_t = _delta(sc, h1, hq, msq, None, True)

        # per-(comp, plane) output accumulators in (NQ*ny, L) space
        accS = [[None] * n_pl for _ in range(C)]
        accDx = [[None] * n_pl for _ in range(C)]
        accDy = [[None] * n_pl for _ in range(C)]

        if qz_stack:
            # ---- qz sublane stacking: ONE q-point physics pass on
            # (NQ*R, L) row-stacked tiles instead of NQ passes on (R, L)
            # — identical FLOPs and HBM traffic, ~NQ-fold fewer VPU
            # instruction issues in the kernel's VPU-bound q-point phase
            # (PERF.md "Remaining gap": the named next lever).
            R = NQ * ny

            def stackq(tiles):
                return jnp.concatenate(tiles, axis=0)

            def repq(t):
                # broadcastable (1, 1) uniform-geometry windows stay as-is
                return (t if t.shape[0] == 1
                        else jnp.concatenate([t] * NQ, axis=0))

            def colq(tab, k):
                # (NQ*R, 1) column whose qz-th row block holds tab[qz, k]
                return jnp.concatenate(
                    [jnp.full((R, 1), tab[j, k], jnp.float32)
                     for j in range(NQ)],
                    axis=0,
                )

            def foldq(t):
                acc = t[0:R]
                for j in range(1, NQ):
                    acc = acc + t[j * R:(j + 1) * R]
                return acc

            u_val = [stackq([zsum(UA[c], qz, s1_ref) for qz in range(NQ)])
                     for c in range(C)]
            dx = [stackq([zsum(UB[c], qz, s1_ref) for qz in range(NQ)])
                  for c in range(C)]
            dy = [stackq([zsum(UC[c], qz, s1_ref) for qz in range(NQ)])
                  for c in range(C)]
            dz = [stackq([zsum(UA[c], qz, d1t_ref) for qz in range(NQ)])
                  for c in range(C)]
            ustar_s = [stackq([ustar[qz][a] for qz in range(NQ)])
                       for a in range(d)]
            jinv_s = [repq(jinvL[r]) for r in range(d * d)]

            def to_phys_s(gref):
                if diag:
                    return [gref[x] * jinv_s[x * d + x] for x in range(d)]
                return [
                    sum(gref[r] * jinv_s[r * d + x] for r in range(d))
                    for x in range(d)
                ]

            u_grad = [to_phys_s([dx[a], dy[a], dz[a]]) for a in range(d)]
            p_grad = to_phys_s([dx[d], dy[d], dz[d]])
            gus = gps = None
            if need_lin_grads:
                ldx = [stackq([zsum(ULB[c], qz, s1_ref)
                               for qz in range(NQ)]) for c in range(C)]
                ldy = [stackq([zsum(ULC[c], qz, s1_ref)
                               for qz in range(NQ)]) for c in range(C)]
                ldz = [stackq([zsum(ULA[c], qz, d1t_ref)
                               for qz in range(NQ)]) for c in range(C)]
                gus = [to_phys_s([ldx[a], ldy[a], ldz[a]])
                       for a in range(d)]
                gps = to_phys_s([ldx[d], ldy[d], ldz[d]])
            dt_old = ([stackq([zsum(VOA[a], qz, s1_ref)
                               for qz in range(NQ)]) for a in range(d)]
                      if need_dt_old else None)

            if cell_wise:
                d1_q, d2_q = repq(d1_t), repq(d2_t)
            else:
                usq_s = stackq(usq)
                d1_q, d2_q = _delta(sc, repq(h1), repq(hq), None, usq_s,
                                    False)

            val_res, grad_res = _physics(
                d, flavor, sc, u_val[:d], u_grad, u_val[d], p_grad,
                ustar_s, gus, gps, dt_old, d1_q, d2_q, consider_dt,
            )

            jxw_s = stackq([jxw_ref[qz, 0] for qz in range(NQ)])
            s1c = [colq(s1_ref, k) for k in range(n_pl)]
            d1c = [colq(d1t_ref, k) for k in range(n_pl)]
            for c in range(C):
                w_val = val_res[c] * jxw_s
                if diag:
                    gref = [
                        grad_res[c][r] * jinv_s[r * d + r] * jxw_s
                        for r in range(d)
                    ]
                else:
                    gref = [
                        sum(grad_res[c][x] * jinv_s[r * d + x]
                            for x in range(d)) * jxw_s
                        for r in range(d)
                    ]
                for k in range(n_pl):
                    accS[c][k] = foldq(s1c[k] * w_val + d1c[k] * gref[2])
                    accDx[c][k] = foldq(s1c[k] * gref[0])
                    accDy[c][k] = foldq(s1c[k] * gref[1])

        for qz in (() if qz_stack else range(NQ)):
            u_val = [zsum(UA[c], qz, s1_ref) for c in range(C)]
            dx = [zsum(UB[c], qz, s1_ref) for c in range(C)]
            dy = [zsum(UC[c], qz, s1_ref) for c in range(C)]
            dz = [zsum(UA[c], qz, d1t_ref) for c in range(C)]

            def to_phys(gref):
                # diagonal-J lattices (any subdivided-rectangle mesh,
                # incl. the benchmark hypercube): the off-diagonal jinv
                # tiles are structurally zero — 1 multiply per direction
                # instead of a 3-term FMA chain (the kernel's q-point
                # phase is VPU-ALU-bound)
                if diag:
                    return [gref[x] * jinvL[x * d + x] for x in range(d)]
                return [
                    sum(gref[r] * jinvL[r * d + x] for r in range(d))
                    for x in range(d)
                ]

            u_grad = [to_phys([dx[a], dy[a], dz[a]]) for a in range(d)]
            p_grad = to_phys([dx[d], dy[d], dz[d]])
            gus = gps = None
            if need_lin_grads:
                ldx = [zsum(ULB[c], qz, s1_ref) for c in range(C)]
                ldy = [zsum(ULC[c], qz, s1_ref) for c in range(C)]
                ldz = [zsum(ULA[c], qz, d1t_ref) for c in range(C)]
                gus = [to_phys([ldx[a], ldy[a], ldz[a]]) for a in range(d)]
                gps = to_phys([ldx[d], ldy[d], ldz[d]])
            dt_old = ([zsum(VOA[a], qz, s1_ref) for a in range(d)]
                      if need_dt_old else None)

            if cell_wise:
                d1_q, d2_q = d1_t, d2_t
            else:
                d1_q, d2_q = _delta(sc, h1, hq, None, usq[qz], False)

            val_res, grad_res = _physics(
                d, flavor, sc, u_val[:d], u_grad, u_val[d], p_grad,
                ustar[qz], gus, gps, dt_old, d1_q, d2_q, consider_dt,
            )

            jxw_t = jxw_ref[qz, 0]
            for c in range(C):
                w_val = val_res[c] * jxw_t
                if diag:
                    gref = [
                        grad_res[c][r] * jinvL[r * d + r] * jxw_t
                        for r in range(d)
                    ]
                else:
                    gref = [
                        sum(grad_res[c][x] * jinvL[r * d + x]
                            for x in range(d)) * jxw_t
                        for r in range(d)
                    ]
                for k in range(n_pl):
                    sz = s1_ref[qz, k]
                    dzw = d1t_ref[qz, k]
                    tS = sz * w_val + dzw * gref[2]
                    tDx = sz * gref[0]
                    tDy = sz * gref[1]
                    accS[c][k] = tS if accS[c][k] is None else accS[c][k] + tS
                    accDx[c][k] = (tDx if accDx[c][k] is None
                                   else accDx[c][k] + tDx)
                    accDy[c][k] = (tDy if accDy[c][k] is None
                                   else accDy[c][k] + tDy)

        # adjoint folds: y overlap-add via the transposed band matmul,
        # then x via the transposed x band
        if merge:
            all_planes = _wide_adjoint_merged(
                accS, accDy, accDx, C, n_pl, LP, bysdT, bysT_q, bsdT_p,
                split, mm, Yr, q8,
            )
        elif wide:
            all_planes = _wide_adjoint(
                accS, accDy, accDx, C, n_pl, LP, bysT, bydT, bsT_p, bdT_p,
                split, mm, Yr,
            )
        else:
            all_planes = []
            for c in range(C):
                planes = []
                for k in range(n_pl):
                    aS = split(accS[c][k])
                    aDy = split(accDy[c][k])
                    aDx = split(accDx[c][k])
                    fS = mm(bysT, aS) + mm(bydT, aDy)
                    fD = mm(bysT, aDx)
                    planes.append(mm(split(fS), bsT) + mm(split(fD), bdT))
                all_planes.append(planes)
        for c in range(C):
            planes = all_planes[c]
            for k in range(1, P):
                outA_ref[c, 0, k - 1] = planes[k]
            if P == 1:
                outA_ref[c, 0, 0] = 0.0 * planes[0]
            outB_ref[c, 0, 0] = planes[0]
            outB_ref[c, 0, 1] = planes[P]

    return kernel



# ---------------------------------------------------------------------------
# the batched 3D kernel: all (component, plane) band contractions fused
# into block matmuls on sublane-stacked tiles — ~30 MXU issues per slab
# instead of ~110 (the kernel is MXU-issue-bound, PERF.md)
# ---------------------------------------------------------------------------
def _make_kernel_3d_batched(dims, flavor, consider_dt, cell_wise,
                            prec_mode):
    d = 3
    P = dims["P"]
    NQ = dims["NQ"]
    nx = dims["nx"]
    ny = dims["ny"]
    C = dims["C"]
    Yr = P * ny + 1
    Yp = -(-Yr // 8) * 8
    R = NQ * ny                 # per-component q-row extent
    need_lin_grads = flavor == "increment"
    need_dt_old = consider_dt and flavor in ("increment", "residual")
    n_pl = P + 1

    def kernel(*refs):
        it = iter(refs)
        scal_ref = next(it)
        s1_ref = next(it)
        d1t_ref = next(it)
        bs_ref = next(it)
        bd_ref = next(it)
        _bys_ref = next(it)
        _byd_ref = next(it)
        bdyS_ref = next(it)
        bdyD_ref = next(it)
        bdyST_ref = next(it)
        bdyDT_ref = next(it)
        jinv_ref = next(it)
        jxw_ref = next(it)
        h_ref = next(it)
        u_refs = [next(it) for _ in range(n_pl)]
        ul_refs = [next(it) for _ in range(n_pl)]
        vo_refs = [next(it) for _ in range(n_pl)]
        outA_ref = next(it)
        outB_ref = next(it)

        sc = dict(
            weight=scal_ref[0, 0], stau=scal_ref[1, 0], nu=scal_ref[2, 0],
            c1=scal_ref[3, 0], c2=scal_ref[4, 0],
        )
        split, mm, splitb = _mm_tools(prec_mode)
        bs = splitb(bs_ref[:])
        bd = splitb(bd_ref[:])
        bsT = splitb(bs_ref[:].T)
        bdT = splitb(bd_ref[:].T)
        bdyS = splitb(bdyS_ref[:])
        bdyD = splitb(bdyD_ref[:])
        bdyST = splitb(bdyST_ref[:])
        bdyDT = splitb(bdyDT_ref[:])
        jinvL = [jinv_ref[r, 0] for r in range(9)]    # (R, L)
        h1 = h_ref[0, 0]
        hq = h_ref[1, 0]
        zrow = None

        def stack_planes(plane_refs, lead, k):
            """(C*Yp, Nx) sublane stack of plane k: per component the Yr
            rows then Yp-Yr zero rows (missing components zero too)."""
            nonlocal zrow
            if zrow is None:
                zrow = jnp.zeros((Yp - Yr, plane_refs[0].shape[-1]),
                                 jnp.float32)
            parts = []
            for c in range(C):
                if c < lead:
                    parts.append(plane_refs[k][c, 0])
                    parts.append(zrow)
                else:
                    parts.append(jnp.zeros((Yp, plane_refs[0].shape[-1]),
                                           jnp.float32))
            return jnp.concatenate(parts, axis=0)

        def fwd(plane_refs, lead, grads):
            """Per plane k: stacked (C*R, L) tensors A (val base),
            B (x-deriv base), Cg (y-deriv base)."""
            A, B, Cg = [], [], []
            for k in range(n_pl):
                t = split(stack_planes(plane_refs, lead, k))  # (C*Yp, Nx)
                tx = split(mm(t, bs))                         # (C*Yp, L)
                A.append(mm(bdyS, tx))                        # (C*R, L)
                if grads:
                    B.append(mm(bdyS, split(mm(t, bd))))
                    Cg.append(mm(bdyD, tx))
                else:
                    B.append(None)
                    Cg.append(None)
            return A, B, Cg

        UA, UB, UC = fwd(u_refs, C, True)
        ULA, ULB, ULC = fwd(ul_refs, C, need_lin_grads)
        VOA = fwd(vo_refs, d, False)[0] if need_dt_old else None

        def zsum(planes, qz, tab):
            acc = None
            for k in range(n_pl):
                t = tab[qz, k] * planes[k]
                acc = t if acc is None else acc + t
            return acc

        def comp(t, c):
            return t[c * R:(c + 1) * R]

        # u* and |u*|^2 per qz from the stacked ul tensors
        ustar = [
            [comp(zsum(ULA, qz, s1_ref), a) for a in range(d)]
            for qz in range(NQ)
        ]
        usq = [sum(u * u for u in us) for us in ustar]

        if cell_wise:
            m = usq[0]
            for qz in range(1, NQ):
                m = jnp.maximum(m, usq[qz])
            mr = None
            for qy in range(NQ):
                sl = m[qy * ny:(qy + 1) * ny]
                mr = sl if mr is None else jnp.maximum(mr, sl)
            mx = None
            for qx in range(NQ):
                sl = mr[:, qx * nx:(qx + 1) * nx]
                mx = sl if mx is None else jnp.maximum(mx, sl)
            row = jnp.concatenate([mx] * NQ, axis=1) if NQ > 1 else mx
            msq = jnp.concatenate([row] * NQ, axis=0) if NQ > 1 else row
            d1_t, d2_t = _delta(sc, h1, hq, msq, None, True)

        accS = [None] * n_pl      # stacked (C*R, L) accumulators
        accDx = [None] * n_pl
        accDy = [None] * n_pl

        for qz in range(NQ):
            valS = zsum(UA, qz, s1_ref)
            dxS = zsum(UB, qz, s1_ref)
            dyS = zsum(UC, qz, s1_ref)
            dzS = zsum(UA, qz, d1t_ref)
            u_val = [comp(valS, c) for c in range(C)]
            dx = [comp(dxS, c) for c in range(C)]
            dy = [comp(dyS, c) for c in range(C)]
            dz = [comp(dzS, c) for c in range(C)]

            def to_phys(gref):
                return [
                    sum(gref[r] * jinvL[r * d + x] for r in range(d))
                    for x in range(d)
                ]

            u_grad = [to_phys([dx[a], dy[a], dz[a]]) for a in range(d)]
            p_grad = to_phys([dx[d], dy[d], dz[d]])
            gus = gps = None
            if need_lin_grads:
                ldxS = zsum(ULB, qz, s1_ref)
                ldyS = zsum(ULC, qz, s1_ref)
                ldzS = zsum(ULA, qz, d1t_ref)
                gus = [
                    to_phys([comp(ldxS, a), comp(ldyS, a), comp(ldzS, a)])
                    for a in range(d)
                ]
                gps = to_phys(
                    [comp(ldxS, d), comp(ldyS, d), comp(ldzS, d)]
                )
            dt_old = None
            if need_dt_old:
                voS = zsum(VOA, qz, s1_ref)
                dt_old = [comp(voS, a) for a in range(d)]

            if cell_wise:
                d1_q, d2_q = d1_t, d2_t
            else:
                d1_q, d2_q = _delta(sc, h1, hq, None, usq[qz], False)

            val_res, grad_res = _physics(
                d, flavor, sc, u_val[:d], u_grad, u_val[d], p_grad,
                ustar[qz], gus, gps, dt_old, d1_q, d2_q, consider_dt,
            )

            jxw_t = jxw_ref[qz, 0]
            # re-stack the per-component integrands to (C*R, L)
            W = jnp.concatenate(
                [val_res[c] * jxw_t for c in range(C)], axis=0
            )
            G = []
            for r in range(d):
                G.append(jnp.concatenate(
                    [
                        sum(grad_res[c][x] * jinvL[r * d + x]
                            for x in range(d)) * jxw_t
                        for c in range(C)
                    ],
                    axis=0,
                ))
            for k in range(n_pl):
                sz = s1_ref[qz, k]
                dzw = d1t_ref[qz, k]
                tS = sz * W + dzw * G[2]
                tDx = sz * G[0]
                tDy = sz * G[1]
                accS[k] = tS if accS[k] is None else accS[k] + tS
                accDx[k] = tDx if accDx[k] is None else accDx[k] + tDx
                accDy[k] = tDy if accDy[k] is None else accDy[k] + tDy

        for k in range(n_pl):
            fS = mm(bdyST, split(accS[k])) + mm(bdyDT, split(accDy[k]))
            fD = mm(bdyST, split(accDx[k]))
            plane = mm(split(fS), bsT) + mm(split(fD), bdT)  # (C*Yp, Nx)
            for c in range(C):
                rows = plane[c * Yp:c * Yp + Yr]
                if 1 <= k <= P - 1:
                    outA_ref[c, 0, k - 1] = rows
                elif k == 0:
                    outB_ref[c, 0, 0] = rows
                    if P == 1:
                        outA_ref[c, 0, 0] = 0.0 * rows
                else:
                    outB_ref[c, 0, 1] = rows

    return kernel


# ---------------------------------------------------------------------------
# the 2D kernel: grid over y-cell rows; x contraction on the MXU, y as
# (P+1)-term scalar sums over the row-window refs
# ---------------------------------------------------------------------------
def _make_kernel_2d(dims, flavor, consider_dt, cell_wise, prec_mode):
    d = 2
    P = dims["P"]
    NQ = dims["NQ"]
    nx = dims["nx"]
    C = dims["C"]
    diag = dims.get("diag", False)
    need_lin_grads = flavor == "increment"
    need_dt_old = consider_dt and flavor in ("increment", "residual")
    n_pl = P + 1

    def kernel(*refs):
        it = iter(refs)
        scal_ref = next(it)
        s1_ref = next(it)
        d1t_ref = next(it)
        bs_ref = next(it)
        bd_ref = next(it)
        _bys_ref = next(it)
        _byd_ref = next(it)
        _bdy = [next(it) for _ in range(4)]
        jinv_ref = next(it)
        jxw_ref = next(it)
        h_ref = next(it)
        u_refs = [next(it) for _ in range(n_pl)]
        ul_refs = [next(it) for _ in range(n_pl)]
        vo_refs = [next(it) for _ in range(n_pl)]
        outA_ref = next(it)
        outB_ref = next(it)

        sc = dict(
            weight=scal_ref[0, 0], stau=scal_ref[1, 0], nu=scal_ref[2, 0],
            c1=scal_ref[3, 0], c2=scal_ref[4, 0],
        )
        split, mm, splitb = _mm_tools(prec_mode)
        bs = splitb(bs_ref[:])
        bd = splitb(bd_ref[:])
        bsT = splitb(bs_ref[:].T)
        bdT = splitb(bd_ref[:].T)
        jinvL = [jinv_ref[r, 0] for r in range(4)]
        h1 = h_ref[0, 0]
        hq = h_ref[1, 0]

        def fwd(plane_refs, lead, grads):
            """Row-stack all (comp, plane) single-row tiles and contract
            the shared-right x band ONCE: the per-tile loop issued
            lead*(P+1) one-row MXU matmuls (1/8 sublane utilization);
            the stacked form is one (nb, Nx) x (Nx, L) matmul."""
            nb = lead * n_pl
            T_all = split(jnp.concatenate(
                [plane_refs[k][c, 0] for c in range(lead)
                 for k in range(n_pl)],
                axis=0,
            ))                                    # (nb, Nx)
            S_all = mm(T_all, bs)                 # (nb, L)
            S = [
                [S_all[(c * n_pl + k):(c * n_pl + k) + 1]
                 for k in range(n_pl)]
                for c in range(lead)
            ]
            D = None
            if grads:
                D_all = mm(T_all, bd)
                D = [
                    [D_all[(c * n_pl + k):(c * n_pl + k) + 1]
                     for k in range(n_pl)]
                    for c in range(lead)
                ]
            return S, D

        US, UD = fwd(u_refs, C, True)
        if need_lin_grads:
            ULS, ULD = fwd(ul_refs, C, True)
        else:
            ULS, ULD = fwd(ul_refs, d, False)
        VOS = fwd(vo_refs, d, False)[0] if need_dt_old else None

        def q2(planes, qy, tab):
            acc = None
            for k in range(n_pl):
                t = tab[qy, k] * planes[k]
                acc = t if acc is None else acc + t
            return acc

        ustar = {}
        usq = {}
        for qy in range(NQ):
            us = [q2(ULS[a], qy, s1_ref) for a in range(d)]
            ustar[qy] = us
            usq[qy] = sum(u * u for u in us)

        if cell_wise:
            m = None
            for v in usq.values():
                m = v if m is None else jnp.maximum(m, v)
            mx = None
            for qx in range(NQ):
                sl = m[:, qx * nx:(qx + 1) * nx]
                mx = sl if mx is None else jnp.maximum(mx, sl)
            msq = (jnp.concatenate([mx] * NQ, axis=1) if NQ > 1 else mx)
            d1_t, d2_t = _delta(sc, h1, hq, msq, None, True)

        accS = [[None] * n_pl for _ in range(C)]
        accD = [[None] * n_pl for _ in range(C)]

        for qy in range(NQ):
            u_val = [q2(US[c], qy, s1_ref) for c in range(C)]
            u_gref = [
                [q2(UD[c], qy, s1_ref), q2(US[c], qy, d1t_ref)]
                for c in range(C)
            ]

            def to_phys(gref):
                if diag:
                    return [gref[x] * jinvL[x * d + x] for x in range(d)]
                return [
                    sum(gref[r] * jinvL[r * d + x] for r in range(d))
                    for x in range(d)
                ]

            u_grad = [to_phys(u_gref[a]) for a in range(d)]
            p_grad = to_phys(u_gref[d])
            gus = gps = None
            if need_lin_grads:
                l_gref = [
                    [q2(ULD[c], qy, s1_ref), q2(ULS[c], qy, d1t_ref)]
                    for c in range(C)
                ]
                gus = [to_phys(l_gref[a]) for a in range(d)]
                gps = to_phys(l_gref[d])
            dt_old = ([q2(VOS[a], qy, s1_ref) for a in range(d)]
                      if need_dt_old else None)

            if cell_wise:
                d1_q, d2_q = d1_t, d2_t
            else:
                d1_q, d2_q = _delta(sc, h1, hq, None, usq[qy], False)

            val_res, grad_res = _physics(
                d, flavor, sc, u_val[:d], u_grad, u_val[d], p_grad,
                ustar[qy], gus, gps, dt_old, d1_q, d2_q, consider_dt,
            )

            jxw_t = jxw_ref[qy, 0]
            for c in range(C):
                w_val = val_res[c] * jxw_t
                if diag:
                    gref = [
                        grad_res[c][r] * jinvL[r * d + r] * jxw_t
                        for r in range(d)
                    ]
                else:
                    gref = [
                        sum(grad_res[c][x] * jinvL[r * d + x]
                            for x in range(d)) * jxw_t
                        for r in range(d)
                    ]
                for k in range(n_pl):
                    sy = s1_ref[qy, k]
                    dyw = d1t_ref[qy, k]
                    tS = sy * w_val + dyw * gref[1]
                    tD = sy * gref[0]
                    accS[c][k] = tS if accS[c][k] is None else accS[c][k] + tS
                    accD[c][k] = tD if accD[c][k] is None else accD[c][k] + tD

        # adjoint: row-stacked transposed-band matmuls (one per band)
        nb2 = C * n_pl
        ACCS = split(jnp.concatenate(
            [accS[c][k] for c in range(C) for k in range(n_pl)], axis=0
        ))                                        # (nb2, L)
        ACCD = split(jnp.concatenate(
            [accD[c][k] for c in range(C) for k in range(n_pl)], axis=0
        ))
        OUT = mm(ACCS, bsT) + mm(ACCD, bdT)       # (nb2, Nx)
        for c in range(C):
            planes = [
                OUT[(c * n_pl + k):(c * n_pl + k) + 1] for k in range(n_pl)
            ]
            for k in range(1, P):
                outA_ref[c, 0, k - 1] = planes[k]
            if P == 1:
                outA_ref[c, 0, 0] = 0.0 * planes[0]
            outB_ref[c, 0, 0] = planes[0]
            outB_ref[c, 0, 1] = planes[P]

    return kernel


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------
class StructuredSweep:
    """Builds and applies the fused structured sweep for one operator.

    ``apply(tables, scal, uT, ulT, voT)`` takes lattice-layout arrays
    ``(C, n_planes_cg, Yr, Nx)`` (free reshapes of the class-grouped node
    vectors) and returns the result in the same layout.
    """

    def __init__(self, op, interpret: bool | None = None,
                 prec_mode: str | None = None):
        if prec_mode is None:
            prec_mode = getattr(op, "structured_precision", "3x")
        prec_mode = os.environ.get("NS_STRUCT_PREC", prec_mode)
        space = op.space
        self.d = d = space.dim
        self.C = d + 1
        self.P = P = space.degree
        self.NQ = space.n_q1d
        cs = space.cell_shape
        self.nx = cs[0]
        self.Nx = P * self.nx + 1
        if d == 3:
            self.ny = cs[1]
            self.n_slabs = cs[2]
            self.Yr = P * self.ny + 1
        else:
            self.ny = 1
            self.n_slabs = cs[1]
            self.Yr = 1
        self.n_rows = int(np.prod([P * n + 1 for n in cs[1:]])) if d == 3 \
            else P * cs[1] + 1
        # flat node vector (class-grouped numbering, fem/space.py) reshapes
        # freely to (C,) + lattice_shape = (n_planes_cg, Yr, Nx)
        self.lattice_shape = (P * self.n_slabs + 1, self.Yr, self.Nx)
        self.consider_dt = op.consider_time_derivative
        self.cell_wise = op.cell_wise_stabilization
        self.nu = op.nu
        self.c1 = op.c_1
        self.c2 = op.c_2
        self.interpret = (
            interpret if interpret is not None
            else jax.default_backend() != "tpu"
        )
        self.prec_mode = prec_mode
        # wide batching (3D): contract all (comp, plane) band matmuls in
        # a handful of lane-concatenated wide matmuls (the kernel is
        # MXU-issue-bound; see _make_kernel_3d fwd_wide). NS_WIDE=0
        # falls back to the per-(comp, plane) schedule.
        self.wide = d == 3 and os.environ.get("NS_WIDE", "1") != "0"
        # qz sublane stacking (3D): one q-point physics pass on
        # (NQ*R, L) row-stacked tiles (NS_QZ_STACK=1 to enable; off by
        # default until measured on chip — see _make_kernel_3d)
        self.qz_stack = d == 3 and os.environ.get("NS_QZ_STACK", "0") == "1"
        # diagonal-Jacobian lattice (any subdivided-rectangle mesh):
        # compile the kernels without the off-diagonal jinv terms.
        # Sharded local views may not expose jinv — stay general there.
        ji = getattr(space, "jinv", None)
        if ji is not None:
            ji = np.asarray(ji)[:, 0]                    # (n_c, d, d)
            off = ji * (1.0 - np.eye(d))
            self.diag_geom = bool(
                np.abs(off).max() <= 1e-14 * np.abs(ji).max()
            )
            # uniform lattice (every cell identical — subdivided
            # hyper-rectangles): the jinv/jxw/h cell tables collapse to
            # (.., 1, 1, 1) windows that broadcast in-kernel — no
            # per-slab table DMA, scalar-operand VPU ops
            jxw = np.asarray(space.jxw)
            hmv = np.asarray(space.cell_h_min_vertex)
            cms = np.asarray(space.cell_measure)
            self.uniform_geom = bool(
                np.abs(ji - ji[:1]).max() <= 1e-14 * np.abs(ji).max()
                and np.abs(jxw - jxw[:1]).max() <= 1e-14 * jxw.max()
                and np.abs(hmv - hmv[0]).max() <= 1e-14 * hmv.max()
                and np.abs(cms - cms[0]).max() <= 1e-14 * cms.max()
            )
        else:
            self.diag_geom = False
            self.uniform_geom = False
        self._calls = {}

    # slab-plane z index in the class-grouped plane axis
    def _zoff(self, k):
        n = self.n_slabs
        return ((k - 1) * n if 1 <= k <= self.P - 1
                else (self.P - 1) * n + (1 if k == self.P else 0))

    def _build_call(self, flavor):
        d, P, C, NQ = self.d, self.P, self.C, self.NQ
        n_pl = P + 1
        Nx, Yr = self.Nx, self.Yr
        ny, nx = self.ny, self.nx
        L = NQ * nx
        R = NQ * ny if d == 3 else 1     # cell-table row extent
        n_slabs = self.n_slabs
        # the batched variant trades ~4x fewer MXU issues for ~3x more
        # block-diagonal FLOPs; measured SLOWER on v5e (1943 vs 2657
        # MDoF/s at ref5 Q2) — keep the per-(comp, plane) kernel
        make = _make_kernel_3d if d == 3 else _make_kernel_2d
        # residual: exact f32 (the Newton rhs/convergence test — bf16x3
        # noise there, an additive ~1e-3-scale floor on large-magnitude
        # states, costs convergence, not speed);
        # increment: the requested mode ("2x" valid — a Newton Jacobian
        # perturbation, see _mm_tools); fixed/rhs (Picard, linearized):
        # solution accuracy inherits operator accuracy, so "2x" demotes
        # to the exact-grade "3x" there
        prec = ("full" if flavor == "residual"
                else self.prec_mode if flavor == "increment"
                else "3x" if self.prec_mode == "2x" else self.prec_mode)
        kw = ({"wide": self.wide, "qz_stack": self.qz_stack}
              if d == 3 else {})
        kernel = make(
            dict(d=d, P=P, NQ=NQ, nx=nx, ny=ny, C=C, diag=self.diag_geom),
            flavor, self.consider_dt, self.cell_wise, prec, **kw,
        )

        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        vmem_full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

        def cell_spec(lead, q_constant=True):
            # uniform lattices shrink the q-constant tables (jinv, h) to
            # broadcastable (lead, 1, 1, 1) windows; jxw keeps its tile
            # extent (its lanes/rows encode the per-q-point weights)
            if self.uniform_geom and q_constant:
                return pl.BlockSpec(
                    (lead, 1, 1, 1), lambda s: (0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            return pl.BlockSpec(
                (lead, 1, R, L), lambda s: (0, s, 0, 0),
                memory_space=pltpu.VMEM,
            )

        def plane_spec(lead, k):
            off = self._zoff(k)
            return pl.BlockSpec(
                (lead, 1, Yr, Nx), lambda s, off=off: (0, off + s, 0, 0),
                memory_space=pltpu.VMEM,
            )

        in_specs = (
            [smem(), smem(), smem(), vmem_full(), vmem_full(),
             vmem_full(), vmem_full(),
             vmem_full(), vmem_full(), vmem_full(), vmem_full(),
             cell_spec(d * d), cell_spec(NQ, q_constant=False),
             cell_spec(2)]
            + [plane_spec(C, k) for k in range(n_pl)]
            + [plane_spec(C, k) for k in range(n_pl)]
            + [plane_spec(d, k) for k in range(n_pl)]
        )
        nA = max(P - 1, 1)
        out_specs = [
            pl.BlockSpec((C, 1, nA, Yr, Nx), lambda s: (0, s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1, 2, Yr, Nx), lambda s: (0, s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((C, n_slabs, nA, Yr, Nx), jnp.float32),
            jax.ShapeDtypeStruct((C, n_slabs, 2, Yr, Nx), jnp.float32),
        ]
        return pl.pallas_call(
            kernel,
            grid=(n_slabs,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=self.interpret,
        )

    def call(self, flavor):
        if flavor not in self._calls:
            self._calls[flavor] = self._build_call(flavor)
        return self._calls[flavor]

    # ------------------------------------------------------------------
    def apply(self, tables: StructuredTables, weight, stau,
              uT, ulT, voT, flavor: str):
        """uT/ulT: (C, n_planes_cg, Yr, Nx); voT: (d, ...). Returns the
        same layout. n_planes_cg = class-grouped plane count (Zr in 3D,
        Yr_total in 2D with Yr=1 inner)."""
        P, C, d = self.P, self.C, self.d
        n_pl = P + 1
        scal = jnp.stack(
            [weight.astype(jnp.float32), stau.astype(jnp.float32),
             jnp.float32(self.nu), jnp.float32(self.c1),
             jnp.float32(self.c2), jnp.float32(0.0), jnp.float32(0.0),
             jnp.float32(0.0)]
        ).reshape(8, 1)
        if self.uniform_geom:
            cell_tabs = [tables.jinv[:, :1, :1, :1], tables.jxw,
                         tables.h[:, :1, :1, :1]]
        else:
            cell_tabs = [tables.jinv, tables.jxw, tables.h]
        args = (
            [scal, tables.S1, tables.D1, tables.band_S, tables.band_D,
             tables.band_Sy, tables.band_Dy]
            + list(tables.bdy)
            + cell_tabs
            + [uT] * n_pl + [ulT] * n_pl + [voT] * n_pl
        )
        outA, outB = self.call(flavor)(*args)

        # assemble the class-grouped plane axis:
        #   interior classes k=1..P-1: slab s owns plane (k-1)*n + s == A
        #   class 0 (n+1 planes): plane s = B[s,0] + B[s-1,1]
        parts = []
        if P > 1:
            # classes 1..P-1 in order: A[:, :, k-1] transposed to
            # (C, n_slabs, Yr, Nx) concatenated along the plane axis
            for k in range(1, P):
                parts.append(outA[:, :, k - 1])
        b0 = outB[:, :, 0]
        b1 = outB[:, :, 1]
        cls0 = jnp.concatenate(
            [b0, jnp.zeros_like(b0[:, :1])], axis=1
        ) + jnp.concatenate([jnp.zeros_like(b1[:, :1]), b1], axis=1)
        parts.append(cls0)
        return jnp.concatenate(parts, axis=1)
