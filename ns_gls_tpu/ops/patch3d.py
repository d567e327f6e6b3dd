"""Patch-lattice fused GLS sweep (Pallas) — the TPU fast path for GENERAL
(non-extruded) 3D meshes.

The 3D sibling of ops/patch2d.py and the completion of ``do_vmult_cell``
parity (``operator_ns.cc:949-1182``: fast on *every* mesh): general 3D
meshes — the Gmsh sphere family (``simulation.cc:852-908``) — decompose
into per-coarse-cell refinement patch lattices
(fem/space.py ``_build_patch3d_numbering``), swept with the prism
kernel's schedule generalized to fully 3D patches:

- grid over (patch group, patch-y cell row), patch-y contracted as
  (P+1)-term scalar-weighted plane sums (class-grouped y planes,
  overlap resolved by shifted adds in XLA — scatter-free),
- G patches stacked on ROWS (class-grouped patch-x, block-diagonal
  banded MXU contraction, K = G*Xn <= 128), H patches on LANES
  (patch-z from the right, K = H*Zn <= 128),
- geometry is FULLY GENERAL per cell per q-point (9 jinv entries + jxw
  tiles) — no prismatic restriction, curved manifolds included,
- patch-seam gather/compress in XLA as dense multiplicity-class maps
  (nodes sorted by patch multiplicity => zero padding waste).

Supported: dim 3, any degree, curved cells, BDF/stationary (theta=1),
cell- or q-wise stabilization, fixed/increment/residual flavors, f32.
Anything else falls back to the general sweep.  Disable with
NS_PATCH3D=0.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ns_gls_tpu.ops.prism import _cg_rank
from ns_gls_tpu.ops.structured import _delta, _mm_tools, _physics


class Patch3DTables(NamedTuple):
    """Device tables for the patch-3D sweep (patch-group layout)."""

    bx_S: jnp.ndarray     # (RG, G*Xn)   block-diag patch-x band (cg rows)
    bx_D: jnp.ndarray
    bx_ST: jnp.ndarray    # (G*Xn, RG)
    bx_DT: jnp.ndarray
    bz_S: jnp.ndarray     # (H*Zn, H*Lz) block-diag patch-z band
    bz_D: jnp.ndarray
    bz_ST: jnp.ndarray    # (H*Lz, H*Zn)
    bz_DT: jnp.ndarray
    S1: jnp.ndarray       # (NQ, P+1)    patch-y 1D tables (SMEM)
    D1: jnp.ndarray
    jinv: jnp.ndarray     # (9, NQ, n_groups*m, RG, LHz)  entries (r*3+x)
    jxw: jnp.ndarray      # (NQ, n_groups*m, RG, LHz)
    h: jnp.ndarray        # (2, n_groups*m, RG, LHz)  (h1, hq), pads 1.0
    gather_nodes: jnp.ndarray   # (n_groups, PlY, G*Xn, H*Zn) int32
    compress: tuple       # per multiplicity class: (n_k, K) int32 flat pos


def _pick_GH(n_patches, Xn, NQ, m, C, P):
    """(G, H): minimize padded q-tile cost subject to K <= 128 caps and
    the Mosaic scoped-VMEM stack (live (RG, lane-padded LHz) f32 tiles
    plus the (9, NQ, RG, LHz) geometry block)."""
    envg = os.environ.get("NS_PATCH3D_G")
    envh = os.environ.get("NS_PATCH3D_H")
    Lq = NQ * m
    Gmax = max(1, 128 // Xn)
    Hmax = max(1, 128 // Xn)
    if envg and envh:
        return min(int(envg), Gmax), min(int(envh), Hmax)
    n_live = 14 * C * (P + 1) // 2 + 40
    budget = 13 * 2**20 // 4
    best = None
    for G in range(1, Gmax + 1):
        for H in range(1, Hmax + 1):
            RG = G * Lq
            lhp = -(-H * Lq // 128) * 128
            vmem = (n_live + (9 + 1) * NQ) * RG * lhp
            if vmem > budget:
                continue
            n_groups = -(-n_patches // (G * H))
            cost = n_groups * (-(-RG // 8) * 8) * lhp
            key = (cost, n_groups, -(G * H))
            if best is None or key < best[0]:
                best = (key, G, H)
    if best is None:
        return 1, 1
    return best[1], best[2]


def build_patch3d_tables(op):
    """Host-side packing; None when the operator/space is unsupported."""
    space = op.space
    if not getattr(space, "patch3d", False):
        return None
    if op.theta != 1.0 or op.dtype != jnp.float32:
        return None
    if os.environ.get("NS_PATCH3D", "1") == "0":
        return None
    from ns_gls_tpu.fem.lagrange import (
        eval_lagrange,
        gauss_lobatto_points_1d,
        gauss_points_1d,
    )

    P = space.degree
    NQ = space.n_q1d
    m = space.patch_cells
    Xn = P * m + 1
    n_patches = space.n_patches
    C = 4
    G, H = _pick_GH(n_patches, Xn, NQ, m, C, P)
    GH = G * H
    n_groups = -(-n_patches // GH)
    Lq = NQ * m
    RG, LHz = G * Lq, H * Lq
    GXn, HZn = G * Xn, H * Xn
    PlY = Xn

    nodes = gauss_lobatto_points_1d(P + 1)
    qpts, qw = gauss_points_1d(NQ)
    S1, D1 = eval_lagrange(tuple(nodes), np.asarray(qpts))  # (NQ, P+1)

    # patch-x band on class-grouped node rows (same layout as the prism
    # kernel: classes 1..P-1 of m entries, then class 0 of m+1)
    cg = _cg_rank(np.arange(Xn), m, P)
    bx = np.zeros((Lq, Xn), np.float32)
    bxd = np.zeros((Lq, Xn), np.float32)
    # patch-z band, natural node order, applied from the right
    bz = np.zeros((Xn, Lq), np.float32)
    bzd = np.zeros((Xn, Lq), np.float32)
    for q in range(NQ):
        for e in range(m):
            for l in range(P + 1):
                bx[q * m + e, cg[P * e + l]] = S1[q, l]
                bxd[q * m + e, cg[P * e + l]] = D1[q, l]
                bz[P * e + l, q * m + e] = S1[q, l]
                bzd[P * e + l, q * m + e] = D1[q, l]

    def blk(b, n):
        r, c = b.shape
        out = np.zeros((n * r, n * c), b.dtype)
        for i in range(n):
            out[i * r:(i + 1) * r, i * c:(i + 1) * c] = b
        return out

    bxG, bxdG = blk(bx, G), blk(bxd, G)
    bzH, bzdH = blk(bz, H), blk(bzd, H)

    # ---- geometry into the (qy, gy-row, RG, LHz) layout ----------------
    jinv_t = np.zeros((9, NQ, n_groups * m, RG, LHz), np.float32)
    jxw_t = np.zeros((NQ, n_groups * m, RG, LHz), np.float32)
    h_t = np.ones((2, n_groups * m, RG, LHz), np.float32)

    patch = space.patch_of_cell3
    lat = space.lattice_of_cell3
    g_of = (patch // GH)
    i_of = (patch % GH) // H
    j_of = (patch % GH) % H
    n_c = len(patch)
    qx = np.arange(NQ)
    rows = (i_of[:, None] * Lq + qx[None, :] * m + lat[:, 0:1])  # (c, NQ)
    lanes = (j_of[:, None] * Lq + qx[None, :] * m + lat[:, 2:3])  # qz lanes
    gyrow = g_of * m + lat[:, 1]                                 # (c,)
    jinv = np.asarray(space.jinv, np.float32)      # (c, q, r, x)
    jxw = np.asarray(space.jxw, np.float32)
    h1 = np.asarray(space.cell_h_min_vertex, np.float32)
    hq = np.asarray(
        np.cbrt(6.0 * space.cell_measure / np.pi) / P, np.float32
    )
    # q = qx + NQ*qy + NQ^2*qz (element numbering, x fastest)
    ci = np.arange(n_c)[:, None, None, None]
    q_idx = (qx[None, None, None, :]
             + NQ * qx[None, :, None, None]
             + NQ * NQ * qx[None, None, :, None])   # (1, qy, qz, qx)
    gy_idx = gyrow[:, None, None, None]
    r_idx = rows[:, None, None, :]                  # (c, 1, 1, NQ)  [qx]
    l_idx = lanes[:, None, :, None]                 # (c, 1, NQ, 1)  [qz]
    qy_idx = qx[None, :, None, None]                # (1, NQ, 1, 1)
    for r in range(3):
        for x in range(3):
            jinv_t[r * 3 + x, qy_idx, gy_idx, r_idx, l_idx] = (
                jinv[ci, q_idx, r, x]
            )
    jxw_t[qy_idx, gy_idx, r_idx, l_idx] = jxw[ci, q_idx]
    h_t[0, gy_idx[:, 0], r_idx[:, 0], l_idx[:, 0]] = (
        h1[:, None, None]
    )
    h_t[1, gy_idx[:, 0], r_idx[:, 0], l_idx[:, 0]] = (
        hq[:, None, None]
    )

    # ---- gather / compress --------------------------------------------
    n_nodes = space.n_nodes
    pn = space.patch_nodes3                  # (n_patches, Zn, Yn, Xn)
    cgy = cg                                 # y planes class-grouped
    gather = np.full((n_groups, PlY, GXn, HZn), n_nodes, np.int32)
    xs = np.arange(Xn)
    p_idx = np.arange(n_patches)
    pg = p_idx // GH
    pi = (p_idx % GH) // H
    pj = (p_idx % GH) % H
    # [p, z, y, x] -> [g, cgy(y), i*Xn + cg(x), j*Zn + z]
    gr = (pi[:, None, None, None] * Xn
          + cg[None, None, None, :])                       # (p,1,1,Xn)
    gl = (pj[:, None, None, None] * Xn
          + xs[None, :, None, None])                       # (p,Zn,1,1)
    gy2 = cgy[None, None, :, None]                         # (1,1,Yn,1)
    gather[pg[:, None, None, None], gy2, gr, gl] = pn
    #          ^ broadcast (p, Zn, Yn, Xn): pn[p, z, y, x] lands at
    #            [g, cgy(y), i*Xn + cg(x), j*Zn + z]

    flat_nodes = gather.reshape(-1).astype(np.int64)
    order = np.argsort(flat_nodes, kind="stable")
    s_nodes = flat_nodes[order]
    n_real = int(np.searchsorted(s_nodes, n_nodes))
    s_nodes = s_nodes[:n_real]
    s_pos = order[:n_real].astype(np.int32)
    uniq, starts, counts = np.unique(
        s_nodes, return_index=True, return_counts=True
    )
    assert len(uniq) == n_nodes and (uniq == np.arange(n_nodes)).all()
    compress = []
    n0 = 0
    while n0 < n_nodes:
        K = int(counts[n0])
        n1 = int(np.searchsorted(counts, K, side="right"))
        idx = np.empty((n1 - n0, K), np.int32)
        for k in range(K):
            idx[:, k] = s_pos[starts[n0:n1] + k]
        compress.append(jnp.asarray(idx))
        n0 = n1

    return Patch3DTables(
        bx_S=jnp.asarray(bxG),
        bx_D=jnp.asarray(bxdG),
        bx_ST=jnp.asarray(bxG.T.copy()),
        bx_DT=jnp.asarray(bxdG.T.copy()),
        bz_S=jnp.asarray(bzH),
        bz_D=jnp.asarray(bzdH),
        bz_ST=jnp.asarray(bzH.T.copy()),
        bz_DT=jnp.asarray(bzdH.T.copy()),
        S1=jnp.asarray(S1.astype(np.float32)),
        D1=jnp.asarray(D1.astype(np.float32)),
        jinv=jnp.asarray(jinv_t),
        jxw=jnp.asarray(jxw_t),
        h=jnp.asarray(h_t),
        gather_nodes=jnp.asarray(gather),
        compress=tuple(compress),
    )


# ---------------------------------------------------------------------------
# kernel: grid over (patch group, patch-y cell row); x and z contractions
# on the MXU (block-diag banded matmuls), patch-y as (P+1)-term sums
# ---------------------------------------------------------------------------
def _make_patch3d_kernel(dims, flavor, consider_dt, cell_wise, prec_mode):
    d = 3
    P = dims["P"]
    NQ = dims["NQ"]
    m = dims["m"]
    G = dims["G"]
    H = dims["H"]
    C = dims["C"]
    Lq = NQ * m
    need_lin_grads = flavor == "increment"
    need_dt_old = consider_dt and flavor in ("increment", "residual")
    n_pl = P + 1

    def kernel(*refs):
        it = iter(refs)
        scal_ref = next(it)
        s1_ref = next(it)
        d1t_ref = next(it)
        bxS_ref = next(it)
        bxD_ref = next(it)
        bxST_ref = next(it)
        bxDT_ref = next(it)
        bzS_ref = next(it)
        bzD_ref = next(it)
        bzST_ref = next(it)
        bzDT_ref = next(it)
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
        bxS = splitb(bxS_ref[:])
        bxD = splitb(bxD_ref[:])
        bxST = splitb(bxST_ref[:])
        bxDT = splitb(bxDT_ref[:])
        bzS = splitb(bzS_ref[:])
        bzD = splitb(bzD_ref[:])
        bzST = splitb(bzST_ref[:])
        bzDT = splitb(bzDT_ref[:])
        jiE = [[jinv_ref[e, qy, 0] for qy in range(NQ)]
               for e in range(9)]                         # (RG, LHz) each
        jxw2 = [jxw_ref[qy, 0] for qy in range(NQ)]
        h1 = h_ref[0, 0]
        hq = h_ref[1, 0]

        def fwd(plane_refs, lead, grads):
            """Per (comp, plane): A = value base, B = z-ref-deriv base,
            Cg = x-ref-deriv base, all on (RG, LHz)."""
            A = [[None] * n_pl for _ in range(lead)]
            B = [[None] * n_pl for _ in range(lead)] if grads else None
            Cg = [[None] * n_pl for _ in range(lead)] if grads else None
            for c in range(lead):
                for k in range(n_pl):
                    t = split(plane_refs[k][c, 0])        # (GXn, HZn)
                    tz = split(mm(t, bzS))                # (GXn, HLz)
                    A[c][k] = mm(bxS, tz)                 # (RG, HLz)
                    if grads:
                        B[c][k] = mm(bxS, split(mm(t, bzD)))
                        Cg[c][k] = mm(bxD, tz)
            return A, B, Cg

        lead_ul = C if need_lin_grads else d
        UA, UB, UC = fwd(u_refs, C, True)
        ULA, ULB, ULC = fwd(ul_refs, lead_ul, need_lin_grads)
        VOA = fwd(vo_refs, d, False)[0] if need_dt_old else None

        def ysum(planes, qy, tab):
            acc = None
            for k in range(n_pl):
                t = tab[qy, k] * planes[k]
                acc = t if acc is None else acc + t
            return acc

        ustar = [
            [ysum(ULA[a], qy, s1_ref) for a in range(d)] for qy in range(NQ)
        ]
        usq = [sum(u * u for u in us) for us in ustar]

        if cell_wise:
            mx_t = usq[0]
            for qy in range(1, NQ):
                mx_t = jnp.maximum(mx_t, usq[qy])
            rows = []
            for i in range(G):
                mg = None
                for qx in range(NQ):
                    sl = mx_t[i * Lq + qx * m: i * Lq + (qx + 1) * m]
                    mg = sl if mg is None else jnp.maximum(mg, sl)
                rows.append(mg)
            mrow = jnp.concatenate(rows, axis=0) if G > 1 else rows[0]
            cols = []
            for j in range(H):
                mc = None
                for qz in range(NQ):
                    sl = mrow[:, j * Lq + qz * m: j * Lq + (qz + 1) * m]
                    mc = sl if mc is None else jnp.maximum(mc, sl)
                cols.append(mc)
            mcell = jnp.concatenate(cols, axis=1) if H > 1 else cols[0]
            lane_parts = []
            for j in range(H):
                sl = mcell[:, j * m:(j + 1) * m]
                lane_parts.extend([sl] * NQ)
            lane_b = (jnp.concatenate(lane_parts, axis=1)
                      if len(lane_parts) > 1 else lane_parts[0])
            row_parts = []
            for i in range(G):
                sl = lane_b[i * m:(i + 1) * m]
                row_parts.extend([sl] * NQ)
            msq = (jnp.concatenate(row_parts, axis=0)
                   if len(row_parts) > 1 else row_parts[0])
            d1_t, d2_t = _delta(sc, h1, hq, msq, None, True)

        accS = [[None] * n_pl for _ in range(C)]
        accDx = [[None] * n_pl for _ in range(C)]
        accDz = [[None] * n_pl for _ in range(C)]

        for qy in range(NQ):
            ji = [jiE[e][qy] for e in range(9)]
            u_val = [ysum(UA[c], qy, s1_ref) for c in range(C)]
            dxr = [ysum(UC[c], qy, s1_ref) for c in range(C)]
            dyr = [ysum(UA[c], qy, d1t_ref) for c in range(C)]
            dzr = [ysum(UB[c], qy, s1_ref) for c in range(C)]

            def to_phys(rx, ry, rz):
                return [
                    rx * ji[0] + ry * ji[3] + rz * ji[6],
                    rx * ji[1] + ry * ji[4] + rz * ji[7],
                    rx * ji[2] + ry * ji[5] + rz * ji[8],
                ]

            u_grad = [to_phys(dxr[a], dyr[a], dzr[a]) for a in range(d)]
            p_grad = to_phys(dxr[d], dyr[d], dzr[d])
            gus = gps = None
            if need_lin_grads:
                ldx = [ysum(ULC[c], qy, s1_ref) for c in range(C)]
                ldy = [ysum(ULA[c], qy, d1t_ref) for c in range(C)]
                ldz = [ysum(ULB[c], qy, s1_ref) for c in range(C)]
                gus = [to_phys(ldx[a], ldy[a], ldz[a]) for a in range(d)]
                gps = to_phys(ldx[d], ldy[d], ldz[d])
            dt_old = ([ysum(VOA[a], qy, s1_ref) for a in range(d)]
                      if need_dt_old else None)

            if cell_wise:
                d1_q, d2_q = d1_t, d2_t
            else:
                d1_q, d2_q = _delta(sc, h1, hq, None, usq[qy], False)

            val_res, grad_res = _physics(
                d, flavor, sc, u_val[:d], u_grad, u_val[d], p_grad,
                ustar[qy], gus, gps, dt_old, d1_q, d2_q, consider_dt,
            )

            jxw_t = jxw2[qy]
            for c in range(C):
                w_val = val_res[c] * jxw_t
                gx = (grad_res[c][0] * ji[0] + grad_res[c][1] * ji[1]
                      + grad_res[c][2] * ji[2]) * jxw_t
                gy = (grad_res[c][0] * ji[3] + grad_res[c][1] * ji[4]
                      + grad_res[c][2] * ji[5]) * jxw_t
                gz = (grad_res[c][0] * ji[6] + grad_res[c][1] * ji[7]
                      + grad_res[c][2] * ji[8]) * jxw_t
                for k in range(n_pl):
                    sy = s1_ref[qy, k]
                    dyw = d1t_ref[qy, k]
                    tS = sy * w_val + dyw * gy
                    tDx = sy * gx
                    tDz = sy * gz
                    accS[c][k] = tS if accS[c][k] is None else accS[c][k] + tS
                    accDx[c][k] = (tDx if accDx[c][k] is None
                                   else accDx[c][k] + tDx)
                    accDz[c][k] = (tDz if accDz[c][k] is None
                                   else accDz[c][k] + tDz)

        for c in range(C):
            planes = []
            for k in range(n_pl):
                fS = (mm(bxST, split(accS[c][k]))
                      + mm(bxDT, split(accDx[c][k])))     # (GXn, HLz)
                fD = mm(bxST, split(accDz[c][k]))
                planes.append(mm(split(fS), bzST) + mm(split(fD), bzDT))
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
class Patch3DSweep:
    """Builds and applies the fused patch-3D sweep for one operator.

    ``gather(tables, v)`` maps a (lead, n_nodes) component-major vector
    view to the patch-group plane tensor; ``apply(...)`` runs the kernel
    and seam-compresses back to (C, n_nodes).
    """

    def __init__(self, op, interpret: bool | None = None,
                 prec_mode: str | None = None):
        if prec_mode is None:
            prec_mode = getattr(op, "structured_precision", "3x")
        space = op.space
        self.C = 4
        self.d = 3
        self.P = P = space.degree
        self.NQ = space.n_q1d
        self.m = space.patch_cells
        self.Xn = P * self.m + 1
        self.n_nodes = space.n_nodes
        self.n_patches = space.n_patches
        self.G, self.H = _pick_GH(
            self.n_patches, self.Xn, self.NQ, self.m, self.C, P
        )
        self.n_groups = -(-self.n_patches // (self.G * self.H))
        self.GXn = self.G * self.Xn
        self.HZn = self.H * self.Xn
        self.RG = self.G * self.NQ * self.m
        self.LHz = self.H * self.NQ * self.m
        self.PlY = self.Xn
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
        self._calls = {}

    # plane index of local patch-y node k of cell row s (class-grouped)
    def _yoff(self, k):
        n = self.m
        return ((k - 1) * n if 1 <= k <= self.P - 1
                else (self.P - 1) * n + (1 if k == self.P else 0))

    def gather(self, tables: Patch3DTables, v):
        """(lead, n_nodes) -> (lead, n_groups*PlY, GXn, HZn)."""
        lead = v.shape[0]
        vz = jnp.concatenate([v, jnp.zeros((lead, 1), v.dtype)], axis=1)
        g = vz[:, tables.gather_nodes]   # (lead, ng, PlY, GXn, HZn)
        return g.reshape(lead, self.n_groups * self.PlY, self.GXn,
                         self.HZn)

    def _build_call(self, flavor):
        P, C, NQ = self.P, self.C, self.NQ
        n_pl = P + 1
        GXn, HZn, PlY = self.GXn, self.HZn, self.PlY
        RG, LHz = self.RG, self.LHz
        n_groups, m = self.n_groups, self.m
        # residual: exact f32 (the Newton rhs/convergence test);
        # increment: the requested mode ("2x" valid — a Newton Jacobian
        # perturbation, see _mm_tools); fixed/rhs (Picard, linearized):
        # solution accuracy inherits operator accuracy, so "2x" demotes
        # to the exact-grade "3x" there
        prec = ("full" if flavor == "residual"
                else self.prec_mode if flavor == "increment"
                else "3x" if self.prec_mode == "2x" else self.prec_mode)
        kernel = _make_patch3d_kernel(
            dict(P=P, NQ=NQ, m=m, G=self.G, H=self.H, C=C),
            flavor, self.consider_dt, self.cell_wise, prec,
        )
        need_lin_grads = flavor == "increment"
        lead_ul = C if need_lin_grads else self.d

        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        vfull = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

        def plane_spec(lead, k):
            off = self._yoff(k)
            return pl.BlockSpec(
                (lead, 1, GXn, HZn),
                lambda gg, s, off=off: (0, gg * PlY + off + s, 0, 0),
                memory_space=pltpu.VMEM,
            )

        in_specs = (
            [smem(), smem(), smem(),
             vfull(), vfull(), vfull(), vfull(),
             vfull(), vfull(), vfull(), vfull(),
             pl.BlockSpec((9, NQ, 1, RG, LHz),
                          lambda gg, s: (0, 0, gg * m + s, 0, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((NQ, 1, RG, LHz),
                          lambda gg, s: (0, gg * m + s, 0, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((2, 1, RG, LHz),
                          lambda gg, s: (0, gg * m + s, 0, 0),
                          memory_space=pltpu.VMEM)]
            + [plane_spec(C, k) for k in range(n_pl)]
            + [plane_spec(lead_ul, k) for k in range(n_pl)]
            + [plane_spec(self.d, k) for k in range(n_pl)]
        )
        nA = max(P - 1, 1)
        out_specs = [
            pl.BlockSpec((C, 1, nA, GXn, HZn),
                         lambda gg, s: (0, gg * m + s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1, 2, GXn, HZn),
                         lambda gg, s: (0, gg * m + s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct(
                (C, n_groups * m, nA, GXn, HZn), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (C, n_groups * m, 2, GXn, HZn), jnp.float32
            ),
        ]
        return pl.pallas_call(
            kernel,
            grid=(n_groups, m),
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
    def apply(self, tables: Patch3DTables, weight, stau, uP, ulP, voP,
              flavor: str):
        """uP/ulP/voP: (lead, n_groups*PlY, GXn, HZn) plane tensors
        (from ``gather``).  Returns (C, n_nodes)."""
        P, C = self.P, self.C
        scal = jnp.stack(
            [weight.astype(jnp.float32), stau.astype(jnp.float32),
             jnp.float32(self.nu), jnp.float32(self.c1),
             jnp.float32(self.c2), jnp.float32(0.0), jnp.float32(0.0),
             jnp.float32(0.0)]
        ).reshape(8, 1)
        args = (
            [scal, tables.S1, tables.D1,
             tables.bx_S, tables.bx_D, tables.bx_ST, tables.bx_DT,
             tables.bz_S, tables.bz_D, tables.bz_ST, tables.bz_DT,
             tables.jinv, tables.jxw, tables.h]
            + [uP] * (P + 1) + [ulP] * (P + 1) + [voP] * (P + 1)
        )
        outA, outB = self.call(flavor)(*args)

        ng, m = self.n_groups, self.m
        outA = outA.reshape(C, ng, m, outA.shape[2], self.GXn, self.HZn)
        outB = outB.reshape(C, ng, m, 2, self.GXn, self.HZn)
        parts = []
        for k in range(1, P):
            parts.append(outA[:, :, :, k - 1])
        b0 = outB[:, :, :, 0]
        b1 = outB[:, :, :, 1]
        cls0 = jnp.concatenate(
            [b0, jnp.zeros_like(b0[:, :, :1])], axis=2
        ) + jnp.concatenate([jnp.zeros_like(b1[:, :, :1]), b1], axis=2)
        parts.append(cls0)
        planes = jnp.concatenate(parts, axis=2)   # (C, ng, PlY, GXn, HZn)

        flat = planes.reshape(C, -1)
        flat = jnp.concatenate(
            [flat, jnp.zeros((C, 1), flat.dtype)], axis=1
        )
        outs = [flat[:, idx].sum(axis=2) for idx in tables.compress]
        return jnp.concatenate(outs, axis=1)      # (C, n_nodes)
