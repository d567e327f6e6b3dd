"""Prism fused GLS sweep (Pallas) — the TPU fast path for EXTRUDED meshes.

The flagship Turek/Hoffmann 3D meshes are (unstructured 2D mesh) x
(z lattice) products (``grid_cylinder.h:153-242``: extrusion + global
refinement).  The reference's ``do_vmult_cell`` (``operator_ns.cc:949-
1182``) is fast on every mesh; this kernel is the TPU equivalent for the
extruded family, removing the XLA-gather floor that limits the general
sweep:

- the **lane axis rides the global z extrusion**: the z contraction is a
  banded MXU matmul over the full ``NQ*nz`` lane extent (the same band
  trick as ops/structured.py's x axis) and the z gather is *free* —
  the product dof numbering (fem/space.py ``_build_prism_numbering``)
  stores each 2D node's z-run contiguously,
- the 2D factor is tiled into **patches** (one per 2D coarse cell: the
  (2^r)^2 lattice its refinements form); patch-x is the row axis
  (class-grouped, banded MXU matmul), patch-y is the slab/grid axis
  (overlap handled by shifted BlockSpec plane views, scatter-free),
- **G patches are stacked along rows** with a block-diagonal patch-x
  band of K = G*Xr <= 128 columns: on the MXU the K padding to 128 is
  paid either way, so the block-diagonal zeros are FREE while the issue
  count drops ~G-fold (the round-2 "batched" experiment lost because
  its K exceeded 128),
- geometry is **prismatic** (J = [[J2d, 0], [0, dz]]): the per-q tables
  are lane-constant (stored with lane extent 1, broadcast in-kernel) and
  jxw separates into a 2D factor times a z-weight row — geometry
  traffic stays ~2D-sized,
- gather/compress across patch seams happens in XLA as *wide row*
  gathers ((node2d, z-run) rows of ``4*Nzn`` bytes), grouped in dense
  multiplicity classes (zero padding waste; fem/space.py sorts 2D nodes
  by patch multiplicity).

Supported: dim 3, any degree, curved (prismatic) cells, BDF/stationary
(theta=1), cell- or q-wise stabilization, fixed/increment/residual
flavors, f32.  Anything else falls back to the general sweep.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ns_gls_tpu.ops.structured import (
    _delta,
    _mm_tools,
    _pad_rows_to,
    _physics,
    _wide_adjoint,
    _wide_fwd,
)


class PrismTables(NamedTuple):
    """Device tables for the prism sweep (patch-grouped layout)."""

    band_S: jnp.ndarray   # (Nzn, L)   z band (lanes)
    band_D: jnp.ndarray   # (Nzn, L)
    bx_S: jnp.ndarray     # (RG, XrG)  block-diag patch-x band (G patches)
    bx_D: jnp.ndarray     # (RG, XrG)
    bx_ST: jnp.ndarray    # (XrG, RG)
    bx_DT: jnp.ndarray    # (XrG, RG)
    S1: jnp.ndarray       # (NQ, P+1)  patch-y 1D tables (SMEM)
    D1: jnp.ndarray       # (NQ, P+1)
    wz: jnp.ndarray       # (1, L)     z quadrature weight row
    jinv2: jnp.ndarray    # (5, NQ, n_groups*my, RG, 1)
    #                       entries: Ji[0,0], Ji[0,1], Ji[1,0], Ji[1,1], 1/dz
    jxw2: jnp.ndarray     # (NQ, n_groups*my, RG, 1)  (jxw / wz(qz))
    h: jnp.ndarray        # (2, n_groups*my, RG, 1)
    gather_nodes: jnp.ndarray   # (n_groups, PlY, G, Xr) int32 -> node2d
    compress: tuple       # per multiplicity class: (n_k, K) int32 flat rows


def _pick_G(n_patches, Xr, NQ, mx, nz, Nzn, C, P) -> int:
    """Patches per kernel row group, adaptive to the ~16 MB Mosaic
    scoped-VMEM stack: the kernel keeps O(C*(P+1)) live (RG, lane)
    f32 arrays whose lane extent pads to 128, so G (which scales the
    row extent RG = G*NQ*mx) is the only free knob.  Hard cap: the
    block-diagonal patch-x band needs K = G*Xr <= 128 MXU columns."""
    import os

    env = os.environ.get("NS_PRISM_G")
    if env:
        return max(1, min(int(env), n_patches, 128 // Xr))
    d = 3
    lane_p = -(-max(NQ * nz, Nzn) // 128) * 128
    # conservative live-array census (bases, accumulators, physics
    # temporaries), calibrated on the observed ref-1 stack usage; the
    # wide-batching schedule keeps ~4 extra lane-concatenated
    # temporaries per (comp, plane) live (stacked-tile splits, restacks)
    wide = os.environ.get("NS_PRISM_WIDE", "1") != "0"
    per_ck = 13 if wide else 9
    n_live = int(
        1.4 * (C * (P + 1) * per_ck + d * (P + 1) + NQ * (d + 1) + 45)
    )
    budget = 13 * 2**20
    rg_max = budget // (n_live * lane_p * 4)
    rg_max = max(8, rg_max // 8 * 8)
    G = max(1, min(n_patches, 128 // Xr, rg_max // (NQ * mx)))
    return G


def _cg_rank(i: np.ndarray, n: int, P: int) -> np.ndarray:
    """Natural lattice index (0..P*n) -> class-grouped rank (classes
    1..P-1 of n entries each, then class 0 of n+1 entries)."""
    i = np.asarray(i)
    k = i % P
    e = i // P
    off = np.where(k >= 1, (k - 1) * n, (P - 1) * n)
    return off + e


def prism_bands(P, NQ, mx, nz, Nzn, G):
    """The replicated basis tables of the prism kernel (G-dependent):
    z band, block-diagonal patch-x band, 1D tables, z quadrature row."""
    from ns_gls_tpu.fem.lagrange import (
        eval_lagrange,
        gauss_lobatto_points_1d,
        gauss_points_1d,
    )

    Xr = P * mx + 1
    RG = G * NQ * mx
    XrG = G * Xr
    L = NQ * nz
    nodes = gauss_lobatto_points_1d(P + 1)
    qpts, qw = gauss_points_1d(NQ)
    S1, D1 = eval_lagrange(tuple(nodes), np.asarray(qpts))  # (NQ, P+1)

    # z band: lanes enumerate (qz, ez) as qz*nz + ez
    band_S = np.zeros((Nzn, L), np.float32)
    band_D = np.zeros((Nzn, L), np.float32)
    for ez in range(nz):
        for i in range(P + 1):
            for qz in range(NQ):
                band_S[P * ez + i, qz * nz + ez] = S1[qz, i]
                band_D[P * ez + i, qz * nz + ez] = D1[qz, i]

    # block-diagonal patch-x band: rows (g, qx, ex), cols (g, cg-rank)
    bx_S = np.zeros((RG, XrG), np.float32)
    bx_D = np.zeros((RG, XrG), np.float32)
    for g in range(G):
        for ex in range(mx):
            for i in range(P + 1):
                r = int(_cg_rank(np.int64(P * ex + i), mx, P))
                for qx in range(NQ):
                    bx_S[g * NQ * mx + qx * mx + ex, g * Xr + r] = S1[qx, i]
                    bx_D[g * NQ * mx + qx * mx + ex, g * Xr + r] = D1[qx, i]

    wz = np.zeros((1, L), np.float32)
    for qz in range(NQ):
        wz[0, qz * nz:(qz + 1) * nz] = qw[qz]
    return dict(band_S=band_S, band_D=band_D, bx_S=bx_S, bx_D=bx_D,
                S1=S1.astype(np.float32), D1=D1.astype(np.float32), wz=wz)


def prism_cell_geometry(op):
    """Per-2D-cell prismatic geometry (qz-independent factors), or None
    when the operator/space is unsupported.  Returns a dict with
    ``ji`` (n_c2d, NQ^2, r, x), ``jxw_col`` (n_c2d, NQ^2), ``h1``/``hq``
    (n_c2d,) — the inputs of :func:`pack_prism_geometry`."""
    space = op.space
    if not getattr(space, "prism", False):
        return None
    if op.theta != 1.0 or op.dtype != jnp.float32:
        return None
    from ns_gls_tpu.fem.lagrange import gauss_points_1d

    NQ = space.n_q1d
    _, qw = gauss_points_1d(NQ)
    mesh = space.mesh
    n_c2d = mesh.extr_mesh2d.n_cells
    col0 = np.full(n_c2d, -1, np.int64)   # a layer-0 3D cell per 2D cell
    sel = mesh.extr_layer == 0
    col0[mesh.extr_cell2d[sel]] = np.nonzero(sel)[0]
    assert (col0 >= 0).all()

    J = np.linalg.inv(space.jinv)        # (c, q, x, r)
    scale = np.abs(J).max()
    # prismatic checks: z column/row decoupled, J2d and dz constant in qz
    # and (cheaply, via the layer-0 representative) usable for the column
    if np.abs(J[:, :, :2, 2]).max() > 1e-9 * scale:
        return None
    if np.abs(J[:, :, 2, :2]).max() > 1e-9 * scale:
        return None
    J_col = J.reshape(mesh.n_cells, NQ, NQ * NQ, 3, 3)
    if np.abs(J_col - J_col[:, :1]).max() > 1e-9 * scale:
        return None
    # all layers of a column share J2d (prismatic extrusion)
    ji = space.jinv[col0][:, : NQ * NQ]   # (n_c2d, NQ^2, r, x), qz = 0
    jxw_col = space.jxw[col0][:, : NQ * NQ] / qw[0]
    h1 = space.cell_h_min_vertex[col0]
    hq = np.cbrt(6.0 * space.cell_measure[col0] / np.pi) / space.degree
    return dict(ji=np.asarray(ji), jxw_col=np.asarray(jxw_col),
                h1=np.asarray(h1), hq=np.asarray(hq))


def pack_prism_geometry(geo, sel, patch_slot, lat, dims):
    """Pack per-2D-cell geometry into the kernel's patch-grouped layout.

    ``sel``: indices of the 2D cells to pack; ``patch_slot``: the packing
    slot (0-based, slot//G = group, slot%G = in-group position) of each
    selected cell's patch; ``lat``: its lattice address.  Returns
    (jinv2, jxw2, h) numpy arrays for ``n_slots`` patch slots."""
    NQ, mx, my, G, n_groups = (
        dims["NQ"], dims["mx"], dims["my"], dims["G"], dims["n_groups"]
    )
    RG = G * NQ * mx
    n_sel = len(sel)

    def pack_cells(vals, fill=0.0):
        """(n_sel, NQ, NQ) (qy, qx) values -> (NQ, n_groups*my, RG, 1)."""
        out = np.full((NQ, n_groups * my, RG, 1), fill, np.float32)
        gg = patch_slot // G
        g = patch_slot % G
        for qy in range(NQ):
            for qx in range(NQ):
                rows = g * NQ * mx + qx * mx + lat[:, 0]
                out[qy, gg * my + lat[:, 1], rows, 0] = vals[:, qy, qx]
        return out

    ji = geo["ji"][sel]
    jxw_col = geo["jxw_col"][sel]
    vq = lambda a: a.reshape(n_sel, NQ, NQ)  # q2d = qx + NQ*qy -> [qy, qx]
    jinv2 = np.stack(
        [
            pack_cells(vq(ji[:, :, 0, 0])),
            pack_cells(vq(ji[:, :, 0, 1])),
            pack_cells(vq(ji[:, :, 1, 0])),
            pack_cells(vq(ji[:, :, 1, 1])),
            pack_cells(vq(ji[:, :, 2, 2])),   # 1/dz
        ]
    )
    jxw2 = pack_cells(vq(jxw_col))
    # h is q-independent: take the qy=0 slice of the cell packing
    h1 = geo["h1"][sel]
    hq = geo["hq"][sel]
    hp = np.stack(
        [
            pack_cells(np.broadcast_to(h1[:, None, None], (n_sel, NQ, NQ)),
                       fill=1.0)[0],
            pack_cells(np.broadcast_to(hq[:, None, None], (n_sel, NQ, NQ)),
                       fill=1.0)[0],
        ]
    )                                   # (2, n_gm, RG, 1)
    return jinv2, jxw2, hp


def build_prism_tables(op):
    """Host-side packing; None when the operator/space is unsupported."""
    space = op.space
    geo = prism_cell_geometry(op)
    if geo is None:
        return None

    P = space.degree
    NQ = space.n_q1d
    mx = my = space.patch_cells
    nz = space.nz_cells
    Xr = P * mx + 1
    Nzn = space.nz_nodes
    Xn = P * mx + 1            # 2D patch lattice extent per axis
    n_patches = space.n_patches
    C = space.dim + 1
    G = _pick_G(n_patches, Xr, NQ, mx, nz, Nzn, C, P)
    n_groups = -(-n_patches // G)
    PlY = P * my + 1

    bands = prism_bands(P, NQ, mx, nz, Nzn, G)
    dims = dict(NQ=NQ, mx=mx, my=my, G=G, n_groups=n_groups)

    # lattice address of each 2D cell inside its patch; the global
    # packing slot of patch p is p itself
    patch = space.patch_of_cell2d
    lat = space.lattice_of_cell2d
    jinv2, jxw2, hp = pack_prism_geometry(
        geo, np.arange(len(patch)), patch, lat, dims
    )

    # ---- gather / compress maps ----------------------------------------
    cgy = _cg_rank(np.arange(Xn), my, P)
    cgx = _cg_rank(np.arange(Xn), mx, P)
    gather_nodes = np.zeros((n_groups, PlY, G, Xr), np.int32)
    pn = space.patch_nodes                      # (n_patches, Xn, Xn)
    p_idx = np.arange(n_patches)
    gg = p_idx // G
    g = p_idx % G
    gather_nodes[gg[:, None, None], cgy[None, :, None], g[:, None, None],
                 cgx[None, None, :]] = pn
    flat = (((gg[:, None, None] * PlY + cgy[None, :, None]) * G
             + g[:, None, None]) * Xr + cgx[None, None, :])

    order = np.argsort(pn.reshape(-1), kind="stable")
    sorted_flat = flat.reshape(-1)[order].astype(np.int64)
    counts = space.node2d_mult                  # ascending (space sorts)
    starts = np.concatenate([[0], np.cumsum(counts)])
    compress = []
    n0 = 0
    while n0 < space.n2d:
        K = int(counts[n0])
        n1 = int(np.searchsorted(counts, K, side="right"))
        idx = np.empty((n1 - n0, K), dtype=np.int32)
        for k in range(K):
            idx[:, k] = sorted_flat[starts[n0:n1] + k]
        compress.append(jnp.asarray(idx))
        n0 = n1

    return PrismTables(
        band_S=jnp.asarray(bands["band_S"]),
        band_D=jnp.asarray(bands["band_D"]),
        bx_S=jnp.asarray(bands["bx_S"]),
        bx_D=jnp.asarray(bands["bx_D"]),
        bx_ST=jnp.asarray(bands["bx_S"].T.copy()),
        bx_DT=jnp.asarray(bands["bx_D"].T.copy()),
        S1=jnp.asarray(bands["S1"]),
        D1=jnp.asarray(bands["D1"]),
        wz=jnp.asarray(bands["wz"]),
        jinv2=jnp.asarray(jinv2),
        jxw2=jnp.asarray(jxw2),
        h=jnp.asarray(hp),
        gather_nodes=jnp.asarray(gather_nodes),
        compress=tuple(compress),
    )


# ---------------------------------------------------------------------------
# the kernel: grid over (patch group, patch-y layer); z and patch-x
# contractions on the MXU, patch-y as (P+1)-term scalar-weighted sums
# ---------------------------------------------------------------------------
def _make_prism_kernel(dims, flavor, consider_dt, cell_wise, prec_mode,
                       wide=False, q_stack=False):
    d = 3
    P = dims["P"]
    NQ = dims["NQ"]
    mx = dims["mx"]
    nz = dims["nz"]
    G = dims["G"]
    C = dims["C"]
    need_lin_grads = flavor == "increment"
    need_dt_old = consider_dt and flavor in ("increment", "residual")
    n_pl = P + 1

    def kernel(*refs):
        it = iter(refs)
        scal_ref = next(it)
        s1_ref = next(it)
        d1t_ref = next(it)
        bzS_ref = next(it)
        bzD_ref = next(it)
        bxS_ref = next(it)
        bxD_ref = next(it)
        bxST_ref = next(it)
        bxDT_ref = next(it)
        wz_ref = next(it)
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
        if not wide:
            bzS = splitb(bzS_ref[:])
            bzD = splitb(bzD_ref[:])
            bzST = splitb(bzS_ref[:].T)
            bzDT = splitb(bzD_ref[:].T)
        bxS = splitb(bxS_ref[:])
        bxD = splitb(bxD_ref[:])
        bxST = splitb(bxST_ref[:])
        bxDT = splitb(bxDT_ref[:])
        wz = wz_ref[:]                                    # (1, L)
        jiE = [[jinv_ref[e, qy, 0] for qy in range(NQ)]
               for e in range(5)]                         # (RG, 1) each
        jxw2 = [jxw_ref[qy, 0] for qy in range(NQ)]       # (RG, 1)
        h1 = h_ref[0, 0]
        hq = h_ref[1, 0]

        # -- wide-batching geometry ------------------------------------
        Nzn, L = bzS_ref.shape
        RG, XrG = bxS_ref.shape
        NznP = -(-Nzn // 128) * 128
        LP = -(-L // 128) * 128

        if wide:
            bzS_p = splitb(_pad_rows_to(bzS_ref[:], NznP))   # (NznP, L)
            bzD_p = splitb(_pad_rows_to(bzD_ref[:], NznP))
            bzST_p = splitb(_pad_rows_to(bzS_ref[:].T, LP))  # (LP, Nzn)
            bzDT_p = splitb(_pad_rows_to(bzD_ref[:].T, LP))

        def fwd_wide(plane_refs, lead, grads):
            """Wide-batched forward (see structured._wide_fwd): the
            block-diagonal patch-x band shared-left, the z band
            shared-right, all (comp, plane) (XrG, Nzn) tiles at once."""
            tiles = [
                plane_refs[k][c, 0] for c in range(lead)
                for k in range(n_pl)
            ]
            return _wide_fwd(tiles, lead, n_pl, NznP, bxS, bxD,
                             bzS_p, bzD_p, grads, split, mm, RG)

        def fwd_narrow(plane_refs, lead, grads):
            """Per (comp, plane): A = value base, B = z-ref-deriv base,
            Cg = x-ref-deriv base, all on (RG, L)."""
            A = [[None] * n_pl for _ in range(lead)]
            B = [[None] * n_pl for _ in range(lead)] if grads else None
            Cg = [[None] * n_pl for _ in range(lead)] if grads else None
            for c in range(lead):
                for k in range(n_pl):
                    t = split(plane_refs[k][c, 0])    # (XrG, Nzn)
                    tz = split(mm(t, bzS))            # (XrG, L)
                    A[c][k] = mm(bxS, tz)             # (RG, L)
                    if grads:
                        B[c][k] = mm(bxS, split(mm(t, bzD)))
                        Cg[c][k] = mm(bxD, tz)
            return A, B, Cg

        fwd = fwd_wide if wide else fwd_narrow

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

        # u* values and |u*|^2 at every qy
        ustar = [
            [ysum(ULA[a], qy, s1_ref) for a in range(d)] for qy in range(NQ)
        ]
        usq = [sum(u * u for u in us) for us in ustar]

        if cell_wise:
            m = usq[0]
            for qy in range(1, NQ):
                m = jnp.maximum(m, usq[qy])
            # reduce over qx within each patch slot (rows), qz (lanes)
            rows = []
            for g in range(G):
                mg = None
                for qx in range(NQ):
                    sl = m[g * NQ * mx + qx * mx:
                           g * NQ * mx + (qx + 1) * mx]
                    mg = sl if mg is None else jnp.maximum(mg, sl)
                rows.append(mg)                        # (mx, L)
            mrow = jnp.concatenate(rows, axis=0) if G > 1 else rows[0]
            mcell = None
            for qz in range(NQ):
                sl = mrow[:, qz * nz:(qz + 1) * nz]
                mcell = sl if mcell is None else jnp.maximum(mcell, sl)
            # broadcast back: lanes tile NQ, rows re-expand per slot
            lane_b = (jnp.concatenate([mcell] * NQ, axis=1)
                      if NQ > 1 else mcell)            # (G*mx, L)
            parts = []
            for g in range(G):
                sl = lane_b[g * mx:(g + 1) * mx]
                parts.extend([sl] * NQ)
            msq = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
            d1_t, d2_t = _delta(sc, h1, hq, msq, None, True)

        accS = [[None] * n_pl for _ in range(C)]
        accDx = [[None] * n_pl for _ in range(C)]   # x-ref direction (rows)
        accDz = [[None] * n_pl for _ in range(C)]   # z-ref direction (lanes)

        if q_stack:
            # ---- qy sublane stacking (NS_QZ_STACK=1): one q-point
            # physics pass on (NQ*RG, L) row-stacked tiles instead of NQ
            # passes on (RG, L) — identical FLOPs/traffic, ~NQ-fold
            # fewer VPU instruction issues (structured.py applies the
            # same schedule to its qz loop; PERF.md "Remaining gap").
            RG_ = bxS_ref.shape[0]

            def stackq(tiles):
                return jnp.concatenate(tiles, axis=0)

            def repq(t):
                return (t if t.shape[0] == 1
                        else jnp.concatenate([t] * NQ, axis=0))

            def colq(tab, k):
                return jnp.concatenate(
                    [jnp.full((RG_, 1), tab[j, k], jnp.float32)
                     for j in range(NQ)],
                    axis=0,
                )

            def foldq(t):
                acc = t[0:RG_]
                for j in range(1, NQ):
                    acc = acc + t[j * RG_:(j + 1) * RG_]
                return acc

            jiE_s = [stackq([jiE[e][qy] for qy in range(NQ)])
                     for e in range(5)]
            a00s, a01s, a10s, a11s, idzs = jiE_s
            u_val = [stackq([ysum(UA[c], qy, s1_ref) for qy in range(NQ)])
                     for c in range(C)]
            dxr = [stackq([ysum(UC[c], qy, s1_ref) for qy in range(NQ)])
                   for c in range(C)]
            dyr = [stackq([ysum(UA[c], qy, d1t_ref) for qy in range(NQ)])
                   for c in range(C)]
            dzr = [stackq([ysum(UB[c], qy, s1_ref) for qy in range(NQ)])
                   for c in range(C)]
            ustar_s = [stackq([ustar[qy][a] for qy in range(NQ)])
                       for a in range(d)]

            def to_phys_s(rx, ry, rz):
                return [rx * a00s + ry * a10s, rx * a01s + ry * a11s,
                        rz * idzs]

            u_grad = [to_phys_s(dxr[a], dyr[a], dzr[a]) for a in range(d)]
            p_grad = to_phys_s(dxr[d], dyr[d], dzr[d])
            gus = gps = None
            if need_lin_grads:
                ldx = [stackq([ysum(ULC[c], qy, s1_ref)
                               for qy in range(NQ)]) for c in range(C)]
                ldy = [stackq([ysum(ULA[c], qy, d1t_ref)
                               for qy in range(NQ)]) for c in range(C)]
                ldz = [stackq([ysum(ULB[c], qy, s1_ref)
                               for qy in range(NQ)]) for c in range(C)]
                gus = [to_phys_s(ldx[a], ldy[a], ldz[a]) for a in range(d)]
                gps = to_phys_s(ldx[d], ldy[d], ldz[d])
            dt_old = ([stackq([ysum(VOA[a], qy, s1_ref)
                               for qy in range(NQ)]) for a in range(d)]
                      if need_dt_old else None)

            if cell_wise:
                d1_q, d2_q = repq(d1_t), repq(d2_t)
            else:
                d1_q, d2_q = _delta(sc, repq(h1), repq(hq), None,
                                    stackq(usq), False)

            val_res, grad_res = _physics(
                d, flavor, sc, u_val[:d], u_grad, u_val[d], p_grad,
                ustar_s, gus, gps, dt_old, d1_q, d2_q, consider_dt,
            )

            jxw_s = stackq(jxw2) * wz                   # (NQ*RG, L)
            s1c = [colq(s1_ref, k) for k in range(n_pl)]
            d1c = [colq(d1t_ref, k) for k in range(n_pl)]
            for c in range(C):
                w_val = val_res[c] * jxw_s
                gx = (grad_res[c][0] * a00s + grad_res[c][1] * a01s) * jxw_s
                gy = (grad_res[c][0] * a10s + grad_res[c][1] * a11s) * jxw_s
                gz = (grad_res[c][2] * idzs) * jxw_s
                for k in range(n_pl):
                    accS[c][k] = foldq(s1c[k] * w_val + d1c[k] * gy)
                    accDx[c][k] = foldq(s1c[k] * gx)
                    accDz[c][k] = foldq(s1c[k] * gz)

        for qy in (() if q_stack else range(NQ)):
            a00, a01, a10, a11, idz = (jiE[e][qy] for e in range(5))
            u_val = [ysum(UA[c], qy, s1_ref) for c in range(C)]
            dxr = [ysum(UC[c], qy, s1_ref) for c in range(C)]
            dyr = [ysum(UA[c], qy, d1t_ref) for c in range(C)]
            dzr = [ysum(UB[c], qy, s1_ref) for c in range(C)]

            def to_phys(rx, ry, rz):
                return [rx * a00 + ry * a10, rx * a01 + ry * a11, rz * idz]

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

            jxw_t = jxw2[qy] * wz                       # (RG, L)
            for c in range(C):
                w_val = val_res[c] * jxw_t
                gx = (grad_res[c][0] * a00 + grad_res[c][1] * a01) * jxw_t
                gy = (grad_res[c][0] * a10 + grad_res[c][1] * a11) * jxw_t
                gz = (grad_res[c][2] * idz) * jxw_t
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

        # adjoint folds: patch-x overlap-add via the transposed block band,
        # then z via the transposed z band
        if wide:
            all_planes = _wide_adjoint(
                accS, accDx, accDz, C, n_pl, LP, bxST, bxDT,
                bzST_p, bzDT_p, split, mm, XrG,
            )
        else:
            all_planes = []
            for c in range(C):
                planes = []
                for k in range(n_pl):
                    fS = (mm(bxST, split(accS[c][k]))
                          + mm(bxDT, split(accDx[c][k])))
                    fD = mm(bxST, split(accDz[c][k]))
                    planes.append(mm(split(fS), bzST) + mm(split(fD), bzDT))
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
# host wrapper
# ---------------------------------------------------------------------------
class PrismSweep:
    """Builds and applies the fused prism sweep for one operator.

    ``gather(tables, u2d)`` maps a (lead, n2d, Nzn) product-layout vector
    view to the patch-grouped plane tensor the kernel consumes;
    ``apply(...)`` runs the kernel and seam-compresses back to
    (C, n2d, Nzn).
    """

    def __init__(self, op, interpret: bool | None = None,
                 prec_mode: str | None = None):
        if prec_mode is None:
            prec_mode = getattr(op, "structured_precision", "3x")
        space = op.space
        self.C = space.dim + 1
        self.d = space.dim
        self.P = P = space.degree
        self.NQ = space.n_q1d
        self.mx = self.my = space.patch_cells
        self.nz = space.nz_cells
        self.Xr = P * self.mx + 1
        self.Nzn = space.nz_nodes
        self.n2d = space.n2d
        self.n_patches = space.n_patches
        self.G = _pick_G(self.n_patches, self.Xr, self.NQ, self.mx,
                         self.nz, self.Nzn, self.C, P)
        self.n_groups = -(-self.n_patches // self.G)
        self.XrG = self.G * self.Xr
        self.PlY = P * self.my + 1
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
        # wide batching: contract all (comp, plane) band matmuls in a
        # handful of lane-concatenated wide matmuls (issue-bound kernel,
        # same treatment as ops/structured.py's 3D fast path)
        import os

        self.wide = os.environ.get("NS_PRISM_WIDE", "1") != "0"
        # qy sublane stacking — same env flag as the structured kernel's
        # qz stacking (ops/structured.py); off until measured on chip
        self.q_stack = os.environ.get("NS_QZ_STACK", "0") == "1"
        self._calls = {}

    # plane index of local patch-y node k of layer s (class-grouped)
    def _yoff(self, k):
        n = self.my
        return ((k - 1) * n if 1 <= k <= self.P - 1
                else (self.P - 1) * n + (1 if k == self.P else 0))

    def gather(self, tables: PrismTables, v2d):
        """(lead, n2d, Nzn) -> (lead, n_groups*PlY, XrG, Nzn)."""
        lead = v2d.shape[0]
        g = v2d[:, tables.gather_nodes]   # (lead, n_groups, PlY, G, Xr, Nzn)
        return g.reshape(lead, self.n_groups * self.PlY, self.XrG, self.Nzn)

    def _build_call(self, flavor):
        P, C, NQ = self.P, self.C, self.NQ
        n_pl = P + 1
        XrG, Nzn, PlY = self.XrG, self.Nzn, self.PlY
        RG = self.G * NQ * self.mx
        n_groups, my = self.n_groups, self.my
        # residual evaluations run once per Newton iteration (vs ~10+
        # Jacobian applies inside GMRES) but their value IS the Newton
        # rhs and convergence test: bf16x3 noise there becomes an
        # additive residual floor (~3e-3 on impulsive-start states,
        # measured round 3), so the residual flavor pays for exact-f32
        # MXU passes while vmult stays on the fast "3x" path.
        # residual: exact f32 (the Newton rhs/convergence test);
        # increment: the requested mode ("2x" valid — a Newton Jacobian
        # perturbation, see _mm_tools); fixed/rhs (Picard, linearized):
        # solution accuracy inherits operator accuracy, so "2x" demotes
        # to the exact-grade "3x" there
        prec = ("full" if flavor == "residual"
                else self.prec_mode if flavor == "increment"
                else "3x" if self.prec_mode == "2x" else self.prec_mode)
        kernel = _make_prism_kernel(
            dict(P=P, NQ=NQ, mx=self.mx, nz=self.nz, G=self.G, C=C),
            flavor, self.consider_dt, self.cell_wise, prec,
            wide=self.wide, q_stack=self.q_stack,
        )

        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        vmem_full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

        def cell_spec4(lead):
            return pl.BlockSpec(
                (lead, 1, RG, 1), lambda gg, s: (0, gg * my + s, 0, 0),
                memory_space=pltpu.VMEM,
            )

        def plane_spec(lead, k):
            off = self._yoff(k)
            return pl.BlockSpec(
                (lead, 1, XrG, Nzn),
                lambda gg, s, off=off: (0, gg * PlY + off + s, 0, 0),
                memory_space=pltpu.VMEM,
            )

        in_specs = (
            [smem(), smem(), smem(), vmem_full(), vmem_full(),
             vmem_full(), vmem_full(), vmem_full(), vmem_full(),
             vmem_full(),
             pl.BlockSpec((5, NQ, 1, RG, 1),
                          lambda gg, s: (0, 0, gg * my + s, 0, 0),
                          memory_space=pltpu.VMEM),
             cell_spec4(NQ), cell_spec4(2)]
            + [plane_spec(C, k) for k in range(n_pl)]
            + [plane_spec(C, k) for k in range(n_pl)]
            + [plane_spec(self.d, k) for k in range(n_pl)]
        )
        nA = max(P - 1, 1)
        out_specs = [
            pl.BlockSpec((C, 1, nA, XrG, Nzn),
                         lambda gg, s: (0, gg * my + s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1, 2, XrG, Nzn),
                         lambda gg, s: (0, gg * my + s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct(
                (C, n_groups * my, nA, XrG, Nzn), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (C, n_groups * my, 2, XrG, Nzn), jnp.float32
            ),
        ]
        return pl.pallas_call(
            kernel,
            grid=(n_groups, my),
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
    def apply(self, tables: PrismTables, weight, stau, uP, ulP, voP,
              flavor: str):
        """uP/ulP: (C, n_groups*PlY, XrG, Nzn) patch-grouped planes
        (from ``gather``); voP: (d, ...).  Returns (C, n2d, Nzn)."""
        P, C = self.P, self.C
        n_pl = P + 1
        scal = jnp.stack(
            [weight.astype(jnp.float32), stau.astype(jnp.float32),
             jnp.float32(self.nu), jnp.float32(self.c1),
             jnp.float32(self.c2), jnp.float32(0.0), jnp.float32(0.0),
             jnp.float32(0.0)]
        ).reshape(8, 1)
        args = (
            [scal, tables.S1, tables.D1, tables.band_S, tables.band_D,
             tables.bx_S, tables.bx_D, tables.bx_ST, tables.bx_DT,
             tables.wz, tables.jinv2, tables.jxw2, tables.h]
            + [uP] * n_pl + [ulP] * n_pl + [voP] * n_pl
        )
        outA, outB = self.call(flavor)(*args)

        ng, my = self.n_groups, self.my
        outA = outA.reshape(C, ng, my, outA.shape[2], self.XrG, self.Nzn)
        outB = outB.reshape(C, ng, my, 2, self.XrG, self.Nzn)
        parts = []
        for k in range(1, P):
            parts.append(outA[:, :, :, k - 1])
        b0 = outB[:, :, :, 0]
        b1 = outB[:, :, :, 1]
        cls0 = jnp.concatenate(
            [b0, jnp.zeros_like(b0[:, :, :1])], axis=2
        ) + jnp.concatenate([jnp.zeros_like(b1[:, :, :1]), b1], axis=2)
        parts.append(cls0)
        planes = jnp.concatenate(parts, axis=2)  # (C, ng, PlY, XrG, Nzn)

        # seam compress: dense multiplicity-class row gathers.  A zero
        # row is appended so padded class rows (the sharded builder,
        # parallel/halo_prism.py) have a harmless gather target; global
        # compress maps never reference it.
        flat = planes.reshape(C, -1, self.Nzn)
        flat = jnp.concatenate([flat, jnp.zeros_like(flat[:, :1])], axis=1)
        outs = [flat[:, idx].sum(axis=2) for idx in tables.compress]
        return jnp.concatenate(outs, axis=1)     # (C, n2d, Nzn)
