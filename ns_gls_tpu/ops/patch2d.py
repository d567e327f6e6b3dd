"""Patch-lattice fused GLS sweep (Pallas) — the TPU fast path for GENERAL
2D meshes.

The reference's ``do_vmult_cell`` (``operator_ns.cc:949-1182``) is fast
on every mesh; for pure-2D unstructured meshes (Turek 2D — the corridor
and validation configs — and any other quad mesh) the TPU equivalent
tiles the mesh into per-coarse-cell refinement PATCHES
(fem/space.py ``_build_patch2d_numbering``; single-cell patches when the
mesh was never refined) and runs the whole cell sweep as one dense
kernel per patch group:

- a group is a (G x H) super-grid of patches: G patches stacked on the
  ROW axis (patch-x contracted by a block-diagonal banded MXU matmul
  from the left, K = G*Xn <= 128 so the block-diagonal zeros are free),
  H patches on the LANE axis (patch-y contracted from the right,
  K = H*Yn <= 128),
- there is NO quadrature loop: the (G*Lx, H*Ly) tile holds every
  quadrature point of the group's patches, so the q-point physics
  evaluates once on a large well-tiled VPU block,
- geometry is fully general (per-cell, per-q ``jinv``): curved
  cylinder-manifold cells cost nothing extra,
- the only XLA-side indexed ops are the patch gather in and the
  seam-compress out, grouped in dense multiplicity classes (2D nodes
  sorted by patch multiplicity => zero padding waste) — O(patch
  perimeter) elements, not O(cells x nodes) like the general sweep.

Supported: dim 2, any degree, curved cells, BDF/stationary (theta=1),
cell- or q-wise stabilization, fixed/increment/residual flavors, f32.
Anything else falls back to the general sweep.  Disable with
NS_PATCH2D=0.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ns_gls_tpu.ops.structured import _delta, _mm_tools, _physics


class Patch2DTables(NamedTuple):
    """Device tables for the patch-2D sweep (patch-group layout)."""

    bx_S: jnp.ndarray     # (G*Lx, G*Xn)  block-diag patch-x band
    bx_D: jnp.ndarray
    bx_ST: jnp.ndarray    # (G*Xn, G*Lx)
    bx_DT: jnp.ndarray
    by_S: jnp.ndarray     # (H*Yn, H*Ly)  block-diag patch-y band
    by_D: jnp.ndarray
    by_ST: jnp.ndarray    # (H*Ly, H*Yn)
    by_DT: jnp.ndarray
    jinv: jnp.ndarray     # (n_groups, 4, RGx, LHy)  entries (r*2+x)
    jxw: jnp.ndarray      # (n_groups, RGx, LHy)
    h: jnp.ndarray        # (n_groups, 2, RGx, LHy)  (h1, hq), pads 1.0
    gather_nodes: jnp.ndarray   # (n_groups, G*Xn, H*Yn) int32 -> node2d
    compress: tuple       # per multiplicity class: (n_k, K) int32 flat pos


def _pick_GH(n_patches, Xn, Yn, NQ, mx, my, C):
    """(G, H) patches per group: minimize total padded q-tile elements
    subject to the band K <= 128 caps and the ~13 MB Mosaic scoped-VMEM
    stack (the kernel keeps ~50 live (RGx, lane-padded LHy) f32 tiles)."""
    envg = os.environ.get("NS_PATCH2D_G")
    envh = os.environ.get("NS_PATCH2D_H")
    Lx, Ly = NQ * mx, NQ * my
    Gmax = max(1, 128 // Xn)
    Hmax = max(1, 128 // Yn)
    if envg and envh:
        return min(int(envg), Gmax), min(int(envh), Hmax)
    n_live = 52
    budget = 13 * 2**20 // (n_live * 4)
    best = None
    for G in range(1, Gmax + 1):
        for H in range(1, Hmax + 1):
            RGx = G * Lx
            lhp = -(-H * Ly // 128) * 128
            if RGx * lhp > budget:
                continue
            n_groups = -(-n_patches // (G * H))
            cost = n_groups * (-(-RGx // 8) * 8) * lhp
            key = (cost, n_groups, -(G * H))
            if best is None or key < best[0]:
                best = (key, G, H)
    if best is None:
        return 1, 1
    return best[1], best[2]


def _band_1d(P, NQ, m):
    """Single-patch 1D bands: (NQ*m, P*m+1) value/derivative tables
    (row = q-class-major: qx*m + cell)."""
    from ns_gls_tpu.fem.lagrange import (
        eval_lagrange,
        gauss_lobatto_points_1d,
        gauss_points_1d,
    )

    nodes = gauss_lobatto_points_1d(P + 1)
    qpts, qw = gauss_points_1d(NQ)
    S1, D1 = eval_lagrange(tuple(nodes), np.asarray(qpts))  # (NQ, P+1)
    L, Xn = NQ * m, P * m + 1
    bS = np.zeros((L, Xn), np.float32)
    bD = np.zeros((L, Xn), np.float32)
    for q in range(NQ):
        for e in range(m):
            for l in range(P + 1):
                bS[q * m + e, P * e + l] = S1[q, l]
                # reference-cell derivative: chain rule to the patch axis
                # is in jinv (per-cell geometry), so keep d/dxi_cell
                bD[q * m + e, P * e + l] = D1[q, l]
    return bS, bD, qw


def _block_diag(b, n):
    L, X = b.shape
    out = np.zeros((n * L, n * X), b.dtype)
    for i in range(n):
        out[i * L:(i + 1) * L, i * X:(i + 1) * X] = b
    return out


class Patch2DTablesAdaptive(NamedTuple):
    """Multi-family tables for adaptively refined meshes: one
    :class:`Patch2DTables` per uniform patch family (``compress=()`` in
    each) plus the GLOBAL seam-compress classes over the concatenation
    of all families' flattened group tiles."""

    fams: tuple
    compress: tuple


def _families_of(space):
    """The space's patch families — synthesized from the legacy
    single-family attributes when ``patch2d_families`` is absent (the
    per-device fake spaces of parallel/halo_patch2d.py)."""
    fams = getattr(space, "patch2d_families", None)
    if fams is not None:
        return fams
    import numpy as _np

    poc = getattr(space, "patch_of_cell2d", None)
    return [dict(
        m=space.patch_cells,
        n_patches=space.n_patches,
        cells=(_np.arange(len(poc)) if poc is not None else None),
        patch_of_cell=poc,
        lattice_of_cell=getattr(space, "lattice_of_cell2d", None),
        patch_nodes=getattr(space, "patch_nodes", None),
    )]


def _family_tables(space, fam, C):
    """Device tables for ONE patch family (no compress); returns
    ``(tables, flat_nodes)`` — flat_nodes is the family's flattened
    gather map for the global seam-compress build."""
    P = space.degree
    NQ = space.n_q1d
    mx = my = fam["m"]
    Xn = Yn = P * mx + 1
    pn = fam["patch_nodes"]                  # (n_patches, Yn, Xn) [y, x]
    n_patches = pn.shape[0]
    G, H = _pick_GH(n_patches, Xn, Yn, NQ, mx, my, C)
    GH = G * H
    n_groups = -(-n_patches // GH)
    Lx, Ly = NQ * mx, NQ * my
    RGx, LHy = G * Lx, H * Ly
    GXn, HYn = G * Xn, H * Yn

    bS, bD, qw = _band_1d(P, NQ, mx)
    bxS = _block_diag(bS, G)
    bxD = _block_diag(bD, G)
    byS = _block_diag(bS.T.copy(), H)
    byD = _block_diag(bD.T.copy(), H)

    # ---- per-cell geometry into the group layout -----------------------
    jinv_t = np.zeros((n_groups, 4, RGx, LHy), np.float32)
    jxw_t = np.zeros((n_groups, RGx, LHy), np.float32)
    h_t = np.ones((n_groups, 2, RGx, LHy), np.float32)

    cells = np.asarray(fam["cells"])
    patch = np.asarray(fam["patch_of_cell"])
    lat = np.asarray(fam["lattice_of_cell"])
    slot = np.arange(n_patches)              # patch p -> packing slot p
    g_of = slot // GH
    i_of = (slot % GH) // H
    j_of = (slot % GH) % H
    cg = g_of[patch]
    ci = i_of[patch]
    cj = j_of[patch]
    qx = np.arange(NQ)
    qy = np.arange(NQ)
    # rows/lanes of cell c's q-points: (n_c, NQ) each
    rows = (ci[:, None] * Lx + qx[None, :] * mx + lat[:, 0:1])
    lanes = (cj[:, None] * Ly + qy[None, :] * my + lat[:, 1:2])
    # q = qx + NQ*qy (element q numbering, x fastest)
    jinv = np.asarray(space.jinv, np.float32)[cells]   # (c, q, r, x)
    jxw = np.asarray(space.jxw, np.float32)[cells]
    h1 = np.asarray(space.cell_h_min_vertex, np.float32)[cells]
    hq = np.asarray(
        np.sqrt(4.0 * space.cell_measure / np.pi) / P, np.float32
    )[cells]
    r_idx = rows[:, None, :]                  # (c, 1, NQ) broadcast qy
    l_idx = lanes[:, :, None]                 # (c, NQ, 1)
    q_idx = qx[None, None, :] + NQ * qy[None, :, None]   # (1, NQ, NQ)
    cgb = cg[:, None, None]
    for r in range(2):
        for x in range(2):
            jinv_t[cgb, r * 2 + x, r_idx, l_idx] = (
                jinv[np.arange(len(patch))[:, None, None], q_idx, r, x]
            )
    jxw_t[cgb, r_idx, l_idx] = jxw[
        np.arange(len(patch))[:, None, None], q_idx
    ]
    h_t[cgb, 0, r_idx, l_idx] = h1[:, None, None]
    h_t[cgb, 1, r_idx, l_idx] = hq[:, None, None]

    # ---- gather map ----------------------------------------------------
    n2d = space.n2d
    gather = np.full((n_groups, GXn, HYn), n2d, np.int32)
    xs = np.arange(Xn)
    ys = np.arange(Yn)
    gr = (i_of[:, None, None] * Xn + xs[None, None, :])   # (p, 1, Xn)
    gl = (j_of[:, None, None] * Yn + ys[None, :, None])   # (p, Yn, 1)
    gather[g_of[:, None, None], gr, gl] = pn   # pn[p, y, x] broadcast fill

    tables = Patch2DTables(
        bx_S=jnp.asarray(bxS),
        bx_D=jnp.asarray(bxD),
        bx_ST=jnp.asarray(bxS.T.copy()),
        bx_DT=jnp.asarray(bxD.T.copy()),
        by_S=jnp.asarray(byS),
        by_D=jnp.asarray(byD),
        by_ST=jnp.asarray(byS.T.copy()),
        by_DT=jnp.asarray(byD.T.copy()),
        jinv=jnp.asarray(jinv_t),
        jxw=jnp.asarray(jxw_t),
        h=jnp.asarray(h_t),
        gather_nodes=jnp.asarray(gather),
        compress=(),
    )
    return tables, gather.reshape(-1).astype(np.int64)


def _build_compress(flat_nodes, n2d):
    """Dense multiplicity-class seam-compress gathers over a flattened
    (possibly multi-family concatenated) group-tile position space."""
    order = np.argsort(flat_nodes, kind="stable")
    s_nodes = flat_nodes[order]
    # drop pad entries (node id n2d)
    n_real = int(np.searchsorted(s_nodes, n2d))
    s_nodes = s_nodes[:n_real]
    s_pos = order[:n_real].astype(np.int64)
    uniq, starts, counts = np.unique(
        s_nodes, return_index=True, return_counts=True
    )
    assert len(uniq) == n2d and (uniq == np.arange(n2d)).all(), \
        "gather tables must cover every 2D node at least once"
    compress = []
    n0 = 0
    while n0 < n2d:
        K = int(counts[n0])
        n1 = int(np.searchsorted(counts, K, side="right"))
        idx = np.empty((n1 - n0, K), np.int64)
        for k in range(K):
            idx[:, k] = s_pos[starts[n0:n1] + k]
        compress.append(jnp.asarray(idx))
        n0 = n1
    return tuple(compress)


def build_patch2d_tables(op):
    """Host-side packing; None when the operator/space is unsupported.
    Returns :class:`Patch2DTables` on uniform meshes and
    :class:`Patch2DTablesAdaptive` (per-size patch families) on
    adaptively refined ones."""
    space = op.space
    if not getattr(space, "patch2d", False):
        return None
    if op.theta != 1.0 or op.dtype != jnp.float32:
        return None
    if os.environ.get("NS_PATCH2D", "1") == "0":
        return None

    C = space.dim + 1
    fams = _families_of(space)
    built = [_family_tables(space, fam, C) for fam in fams]
    if len(built) == 1:
        tables, flat = built[0]
        return tables._replace(compress=_build_compress(flat, space.n2d))
    # apply() concatenates the family flats in family order, so the
    # index into the concatenation IS the global position — the same
    # class builder covers the multi-family case directly
    flat_all = np.concatenate([flat for _, flat in built])
    return Patch2DTablesAdaptive(
        fams=tuple(t for t, _ in built),
        compress=_build_compress(flat_all, space.n2d),
    )


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------
def _make_patch2d_kernel(dims, flavor, consider_dt, cell_wise, prec_mode):
    d = 2
    NQ = dims["NQ"]
    mx = dims["mx"]
    my = dims["my"]
    G = dims["G"]
    H = dims["H"]
    C = dims["C"]
    Lx, Ly = NQ * mx, NQ * my
    need_lin_grads = flavor == "increment"
    need_dt_old = consider_dt and flavor in ("increment", "residual")

    def kernel(scal_ref, bxS_ref, bxD_ref, bxST_ref, bxDT_ref,
               byS_ref, byD_ref, byST_ref, byDT_ref,
               jinv_ref, jxw_ref, h_ref, u_ref, ul_ref, vo_ref, out_ref):
        sc = dict(
            weight=scal_ref[0, 0], stau=scal_ref[1, 0], nu=scal_ref[2, 0],
            c1=scal_ref[3, 0], c2=scal_ref[4, 0],
        )
        split, mm, splitb = _mm_tools(prec_mode)
        bxS = splitb(bxS_ref[:])
        bxD = splitb(bxD_ref[:])
        bxST = splitb(bxST_ref[:])
        bxDT = splitb(bxDT_ref[:])
        byS = splitb(byS_ref[:])
        byD = splitb(byD_ref[:])
        byST = splitb(byST_ref[:])
        byDT = splitb(byDT_ref[:])
        jiE = [jinv_ref[0, k] for k in range(4)]          # (RGx, LHy)
        jxw = jxw_ref[0]
        h1 = h_ref[0, 0]
        hq = h_ref[0, 1]

        def fwd(ref, lead, grads):
            vals, dxs, dys = [], [], []
            for c in range(lead):
                t = split(ref[c, 0])                      # (GXn, HYn)
                t1 = split(mm(bxS, t))                    # (RGx, HYn)
                vals.append(mm(t1, byS))                  # (RGx, LHy)
                if grads:
                    dys.append(mm(t1, byD))
                    dxs.append(mm(split(mm(bxD, t)), byS))
            return vals, dxs, dys

        u_val, u_dx, u_dy = fwd(u_ref, C, True)
        if need_lin_grads:
            ul_val, ul_dx, ul_dy = fwd(ul_ref, C, True)
        else:
            ul_val = fwd(ul_ref, d, False)[0]
        dt_old = fwd(vo_ref, d, False)[0] if need_dt_old else None

        ustar = ul_val[:d]
        usq = sum(u * u for u in ustar)

        if cell_wise:
            # per-cell max of |u*|^2 over the cell's q-points, broadcast
            # back to the q layout (rows: qx blocks per patch-row; lanes:
            # qy blocks per patch-lane)
            rows = []
            for i in range(G):
                mg = None
                for qx in range(NQ):
                    sl = usq[i * Lx + qx * mx: i * Lx + (qx + 1) * mx]
                    mg = sl if mg is None else jnp.maximum(mg, sl)
                rows.append(mg)
            mrow = jnp.concatenate(rows, axis=0) if G > 1 else rows[0]
            cols = []
            for j in range(H):
                mc = None
                for qy in range(NQ):
                    sl = mrow[:, j * Ly + qy * my: j * Ly + (qy + 1) * my]
                    mc = sl if mc is None else jnp.maximum(mc, sl)
                cols.append(mc)
            mcell = jnp.concatenate(cols, axis=1) if H > 1 else cols[0]
            lane_parts = []
            for j in range(H):
                sl = mcell[:, j * my:(j + 1) * my]
                lane_parts.extend([sl] * NQ)
            lane_b = (jnp.concatenate(lane_parts, axis=1)
                      if len(lane_parts) > 1 else lane_parts[0])
            row_parts = []
            for i in range(G):
                sl = lane_b[i * mx:(i + 1) * mx]
                row_parts.extend([sl] * NQ)
            msq = (jnp.concatenate(row_parts, axis=0)
                   if len(row_parts) > 1 else row_parts[0])
            d1_q, d2_q = _delta(sc, h1, hq, msq, None, True)
        else:
            d1_q, d2_q = _delta(sc, h1, hq, None, usq, False)

        def to_phys(dx, dy):
            return [dx * jiE[0] + dy * jiE[2], dx * jiE[1] + dy * jiE[3]]

        u_grad = [to_phys(u_dx[a], u_dy[a]) for a in range(d)]
        p_grad = to_phys(u_dx[d], u_dy[d])
        gus = gps = None
        if need_lin_grads:
            gus = [to_phys(ul_dx[a], ul_dy[a]) for a in range(d)]
            gps = to_phys(ul_dx[d], ul_dy[d])

        val_res, grad_res = _physics(
            d, flavor, sc, u_val[:d], u_grad, u_val[d], p_grad,
            ustar, gus, gps, dt_old, d1_q, d2_q, consider_dt,
        )

        for c in range(C):
            w_val = val_res[c] * jxw
            grx = (grad_res[c][0] * jiE[0] + grad_res[c][1] * jiE[1]) * jxw
            gry = (grad_res[c][0] * jiE[2] + grad_res[c][1] * jiE[3]) * jxw
            inner1 = mm(split(w_val), byST) + mm(split(gry), byDT)
            inner2 = mm(split(grx), byST)
            out_ref[c, 0] = (
                mm(bxST, split(inner1)) + mm(bxDT, split(inner2))
            )

    return kernel


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------
class Patch2DSweep:
    """Builds and applies the fused patch-2D sweep for one operator.

    ``gather(tables, v)`` maps a (lead, n2d) component-major vector view
    to the patch-group tensor the kernel consumes; ``apply(...)`` runs
    the kernel and seam-compresses back to (C, n2d).
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
        self.n2d = space.n2d
        # per-family static dims (one family on uniform meshes)
        self.fdims = []
        for fam in _families_of(space):
            mx = fam["m"]
            Xn = P * mx + 1
            n_patches = fam.get(
                "n_patches", 0
            ) or fam["patch_nodes"].shape[0]
            G, H = _pick_GH(n_patches, Xn, Xn, self.NQ, mx, mx, self.C)
            self.fdims.append(dict(
                mx=mx, my=mx, Xn=Xn, Yn=Xn, G=G, H=H,
                n_patches=n_patches,
                n_groups=-(-n_patches // (G * H)),
                GXn=G * Xn, HYn=H * Xn,
                RGx=G * self.NQ * mx, LHy=H * self.NQ * mx,
            ))
        self.multi = len(self.fdims) > 1
        if not self.multi:
            fd = self.fdims[0]
            self.mx = self.my = fd["mx"]
            self.Xn = self.Yn = fd["Xn"]
            self.n_patches = fd["n_patches"]
            self.G, self.H = fd["G"], fd["H"]
            self.n_groups = fd["n_groups"]
            self.GXn, self.HYn = fd["GXn"], fd["HYn"]
            self.RGx, self.LHy = fd["RGx"], fd["LHy"]
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

    def gather(self, tables, v):
        """(lead, n2d) -> (lead, n_groups, GXn, HYn) per family (a bare
        tensor on uniform meshes, a tuple on adaptive ones); pads read
        zero."""
        lead = v.shape[0]
        vz = jnp.concatenate(
            [v, jnp.zeros((lead, 1), v.dtype)], axis=1
        )
        if isinstance(tables, Patch2DTablesAdaptive):
            return tuple(vz[:, t.gather_nodes] for t in tables.fams)
        return vz[:, tables.gather_nodes]

    def _build_call(self, flavor, fi=0):
        C, d = self.C, self.d
        fd = self.fdims[fi]
        n_groups = fd["n_groups"]
        GXn, HYn, RGx, LHy = fd["GXn"], fd["HYn"], fd["RGx"], fd["LHy"]
        # the residual is the Newton rhs and convergence test: exact-f32
        # MXU passes there (same policy as ops/prism.py)
        # residual: exact f32 (the Newton rhs/convergence test);
        # increment: the requested mode ("2x" valid — a Newton Jacobian
        # perturbation, see _mm_tools); fixed/rhs (Picard, linearized):
        # solution accuracy inherits operator accuracy, so "2x" demotes
        # to the exact-grade "3x" there
        prec = ("full" if flavor == "residual"
                else self.prec_mode if flavor == "increment"
                else "3x" if self.prec_mode == "2x" else self.prec_mode)
        kernel = _make_patch2d_kernel(
            dict(NQ=self.NQ, mx=fd["mx"], my=fd["my"], G=fd["G"],
                 H=fd["H"], C=C),
            flavor, self.consider_dt, self.cell_wise, prec,
        )
        need_lin_grads = flavor == "increment"
        lead_ul = C if need_lin_grads else d

        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        vfull = pl.BlockSpec(memory_space=pltpu.VMEM)

        def group_spec(shape_prefix):
            n = len(shape_prefix)
            return pl.BlockSpec(
                (1,) + shape_prefix,
                lambda g: (g,) + (0,) * n,
                memory_space=pltpu.VMEM,
            )

        def lead_spec(lead):
            return pl.BlockSpec(
                (lead, 1, GXn, HYn), lambda g: (0, g, 0, 0),
                memory_space=pltpu.VMEM,
            )

        in_specs = [
            smem, vfull, vfull, vfull, vfull, vfull, vfull, vfull, vfull,
            group_spec((4, RGx, LHy)),
            group_spec((RGx, LHy)),
            group_spec((2, RGx, LHy)),
            lead_spec(C), lead_spec(lead_ul), lead_spec(d),
        ]
        out_specs = lead_spec(C)
        out_shape = jax.ShapeDtypeStruct(
            (C, n_groups, GXn, HYn), jnp.float32
        )
        return pl.pallas_call(
            kernel,
            grid=(n_groups,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=self.interpret,
        )

    def call(self, flavor, fi=0):
        if (flavor, fi) not in self._calls:
            self._calls[(flavor, fi)] = self._build_call(flavor, fi)
        return self._calls[(flavor, fi)]

    # ------------------------------------------------------------------
    def apply(self, tables, weight, stau, uP, ulP, voP, flavor: str):
        """uP/ulP/voP: (lead, n_groups, GXn, HYn) patch-group tensors
        (from ``gather``; per-family tuples on adaptive meshes).
        Returns (C, n2d)."""
        scal = jnp.stack(
            [weight.astype(jnp.float32), stau.astype(jnp.float32),
             jnp.float32(self.nu), jnp.float32(self.c1),
             jnp.float32(self.c2), jnp.float32(0.0), jnp.float32(0.0),
             jnp.float32(0.0)]
        ).reshape(8, 1)

        def run(fi, t, u_f, ul_f, vo_f):
            return self.call(flavor, fi)(
                scal, t.bx_S, t.bx_D, t.bx_ST, t.bx_DT,
                t.by_S, t.by_D, t.by_ST, t.by_DT,
                t.jinv, t.jxw, t.h, u_f, ul_f, vo_f,
            )

        if isinstance(tables, Patch2DTablesAdaptive):
            flats = [
                run(fi, t, uP[fi], ulP[fi], voP[fi]).reshape(self.C, -1)
                for fi, t in enumerate(tables.fams)
            ]
            flat = jnp.concatenate(
                flats + [jnp.zeros((self.C, 1), flats[0].dtype)], axis=1
            )
        else:
            out = run(0, tables, uP, ulP, voP)
            flat = out.reshape(self.C, -1)
            flat = jnp.concatenate(
                [flat, jnp.zeros((self.C, 1), flat.dtype)], axis=1
            )
        outs = [flat[:, idx].sum(axis=2) for idx in tables.compress]
        return jnp.concatenate(outs, axis=1)          # (C, n2d)
