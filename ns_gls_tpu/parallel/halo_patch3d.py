"""Distributed patch-3D fast path: the patch-lattice 3D Pallas sweep as
the halo local sweep on general (non-extruded) 3D meshes — the Gmsh
sphere family.

The 3D sibling of parallel/halo_patch2d.py: partition by patch
(contiguous Morton-3D runs of refinement patches per device), pack
per-device :class:`~ns_gls_tpu.ops.patch3d.Patch3DTables` against the
device's halo window (uniform shapes across devices; pads to zero
rows), run the fused kernel per device inside the halo ``shard_map``,
and let the standard reverse ghost exchange sum inter-device seam
partials — collective volume stays O(halo)
(``operator_ns.cc:702-717``)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ns_gls_tpu.ops.patch3d import Patch3DSweep, Patch3DTables, _pick_GH
from ns_gls_tpu.ops.prism import _cg_rank


class HaloPatch3DArgs(NamedTuple):
    """Device-major patch-3D tables + output scatter map (window slots;
    pads -> ``n_loc``)."""

    tables: Patch3DTables
    oslot: jnp.ndarray      # (n_dev, n_cat) int32


def _morton3d(pts: np.ndarray) -> np.ndarray:
    lo, hi = pts.min(0), pts.max(0)
    span = np.where(hi - lo > 0, hi - lo, 1.0)
    q = ((pts - lo) / span * ((1 << 10) - 1)).astype(np.uint64)
    code = np.zeros(len(pts), dtype=np.uint64)
    for bit in range(10):
        for d in range(3):
            code |= ((q[:, d] >> np.uint64(bit)) & np.uint64(1)) << np.uint64(
                bit * 3 + d
            )
    return np.argsort(code, kind="stable")


def patch3d_partition(space, n_dev: int):
    """Partition the 3D mesh by patch.  Returns (cells_of, patches_of)
    or None when infeasible."""
    n_patches = space.n_patches
    if n_patches < n_dev:
        return None
    mesh = space.mesh
    c3 = mesh.vertices[mesh.cells].mean(axis=1)
    pc = np.zeros((n_patches, 3))
    cnt = np.zeros(n_patches)
    np.add.at(pc, space.patch_of_cell3, c3)
    np.add.at(cnt, space.patch_of_cell3, 1)
    pc /= cnt[:, None]
    perm = _morton3d(pc)
    patches_of = np.array_split(perm, n_dev)
    if any(len(pl) == 0 for pl in patches_of):
        return None
    pdev = np.empty(n_patches, np.int64)
    for d, pl in enumerate(patches_of):
        pdev[pl] = d
    cells_of = [
        np.nonzero(pdev[space.patch_of_cell3] == d)[0] for d in range(n_dev)
    ]
    return cells_of, patches_of


class _LocalView:
    pass


def build_halo_patch3d(op, patches_of, g2l: np.ndarray, n_loc: int):
    """Per-device patch-3D tables for the halo local sweep.

    Returns (HaloPatch3DArgs, local Patch3DSweep, lin_idx) or None.
    ``lin_idx``: (n_dev, n_groups*PlY, GXn, HZn) GLOBAL node gather map
    for the linearization/history planes (pads -> n_nodes)."""
    if getattr(op, "_p3sweep", None) is None:
        return None
    space = op.space
    n_dev = len(patches_of)
    P = space.degree
    NQ = space.n_q1d
    m = space.patch_cells
    Xn = P * m + 1
    n_pp = max(len(pl) for pl in patches_of)
    C = 4

    lv = _LocalView()
    lv.space = _LocalView()
    lv.space.dim = 3
    lv.space.degree = P
    lv.space.n_q1d = NQ
    lv.space.patch_cells = m
    lv.space.n_patches = n_pp
    lv.space.n_nodes = 0                 # set after the class layout
    lv.space.patch3d = True
    lv.consider_time_derivative = op.consider_time_derivative
    lv.cell_wise_stabilization = op.cell_wise_stabilization
    lv.nu, lv.c_1, lv.c_2 = op.nu, op.c_1, op.c_2
    lv.structured_precision = getattr(op, "structured_precision", "3x")
    sweep = Patch3DSweep(op=lv)
    G, H = sweep.G, sweep.H
    GH = G * H
    n_groups = sweep.n_groups
    GXn, HZn, PlY = sweep.GXn, sweep.HZn, sweep.PlY
    Lq = NQ * m
    RG, LHz = sweep.RG, sweep.LHz
    zero_flat = n_groups * PlY * GXn * HZn

    cg = _cg_rank(np.arange(Xn), m, P)
    jinv = np.asarray(space.jinv, np.float32)
    jxw = np.asarray(space.jxw, np.float32)
    h1_all = np.asarray(space.cell_h_min_vertex, np.float32)
    hq_all = np.asarray(
        np.cbrt(6.0 * space.cell_measure / np.pi) / P, np.float32
    )
    patch_of = space.patch_of_cell3
    lat_of = space.lattice_of_cell3
    pn_all = space.patch_nodes3.astype(np.int64)   # (n_p, Zn, Yn, Xn)
    qx = np.arange(NQ)
    xs = np.arange(Xn)

    per_dev = []
    for d in range(n_dev):
        pl = np.asarray(patches_of[d])
        slot_of = np.full(space.n_patches, -1, np.int64)
        slot_of[pl] = np.arange(len(pl))
        sel = np.nonzero(slot_of[patch_of] >= 0)[0]
        cs = slot_of[patch_of[sel]]
        ci = (cs % GH) // H
        cj = (cs % GH) % H
        cg_grp = cs // GH
        lat = lat_of[sel]
        rows = (ci[:, None] * Lq + qx[None, :] * m + lat[:, 0:1])
        lanes = (cj[:, None] * Lq + qx[None, :] * m + lat[:, 2:3])
        gyrow = cg_grp * m + lat[:, 1]
        jinv_t = np.zeros((9, NQ, n_groups * m, RG, LHz), np.float32)
        jxw_t = np.zeros((NQ, n_groups * m, RG, LHz), np.float32)
        h_t = np.ones((2, n_groups * m, RG, LHz), np.float32)
        ci4 = sel[:, None, None, None]
        q_idx = (qx[None, None, None, :]
                 + NQ * qx[None, :, None, None]
                 + NQ * NQ * qx[None, None, :, None])
        gy_idx = gyrow[:, None, None, None]
        r_idx = rows[:, None, None, :]
        l_idx = lanes[:, None, :, None]
        qy_idx = qx[None, :, None, None]
        for r in range(3):
            for x in range(3):
                jinv_t[r * 3 + x, qy_idx, gy_idx, r_idx, l_idx] = (
                    jinv[ci4, q_idx, r, x]
                )
        jxw_t[qy_idx, gy_idx, r_idx, l_idx] = jxw[ci4, q_idx]
        h_t[0, gy_idx[:, 0], r_idx[:, 0], l_idx[:, 0]] = (
            h1_all[sel][:, None, None]
        )
        h_t[1, gy_idx[:, 0], r_idx[:, 0], l_idx[:, 0]] = (
            hq_all[sel][:, None, None]
        )

        pg = np.arange(len(pl)) // GH
        pi = (np.arange(len(pl)) % GH) // H
        pj = (np.arange(len(pl)) % GH) % H
        gn = np.full((n_groups, PlY, GXn, HZn), n_loc, np.int32)
        gl_glob = np.full(
            (n_groups, PlY, GXn, HZn), space.n_nodes, np.int32
        )
        gr = (pi[:, None, None, None] * Xn + cg[None, None, None, :])
        gl = (pj[:, None, None, None] * Xn + xs[None, :, None, None])
        gy2 = cg[None, None, :, None]
        pn = pn_all[pl]
        g2l_d = g2l[d]
        loc = g2l_d[pn]
        assert (loc < n_loc).all(), "patch node outside cell-touched window"
        gn[pg[:, None, None, None], gy2, gr, gl] = loc
        gl_glob[pg[:, None, None, None], gy2, gr, gl] = pn
        flat = (((pg[:, None, None, None] * PlY + gy2) * GXn + gr) * HZn
                + gl)                                   # (p, Zn, Yn, Xn)
        nodes_f = pn.reshape(-1)
        flats_f = np.broadcast_to(flat, pn.shape).reshape(-1)
        order = np.argsort(nodes_f, kind="stable")
        s_nodes = nodes_f[order]
        s_flat = flats_f[order]
        uniq, starts, counts = np.unique(
            s_nodes, return_index=True, return_counts=True
        )
        per_dev.append(dict(
            jinv=jinv_t, jxw=jxw_t, h=h_t, gn=gn, gl=gl_glob,
            uniq=uniq, starts=starts, counts=counts, s_flat=s_flat,
            uloc=g2l_d[uniq],
        ))

    Ks = sorted({int(k) for pd in per_dev for k in np.unique(pd["counts"])})
    nk_max = {
        K: max(int((pd["counts"] == K).sum()) for pd in per_dev) for K in Ks
    }
    n_cat = sum(nk_max.values())
    lv.space.n_nodes = sweep.n_nodes = n_cat

    compress = {K: np.full((n_dev, nk_max[K], K), zero_flat, np.int32)
                for K in Ks}
    oslot = np.full((n_dev, n_cat), n_loc, np.int32)
    for d, pd in enumerate(per_dev):
        off = 0
        for K in Ks:
            mk = pd["counts"] == K
            nodes_k = np.nonzero(mk)[0]
            for j, ui in enumerate(nodes_k):
                st = pd["starts"][ui]
                compress[K][d, j] = pd["s_flat"][st: st + K]
            oslot[d, off: off + len(nodes_k)] = pd["uloc"][nodes_k]
            off += nk_max[K]

    # bands must match the PER-DEVICE (G, H); build them directly
    from ns_gls_tpu.fem.lagrange import (
        eval_lagrange,
        gauss_lobatto_points_1d,
        gauss_points_1d,
    )

    nodes = gauss_lobatto_points_1d(P + 1)
    qpts, _ = gauss_points_1d(NQ)
    S1, D1 = eval_lagrange(tuple(nodes), np.asarray(qpts))
    bx = np.zeros((Lq, Xn), np.float32)
    bxd = np.zeros((Lq, Xn), np.float32)
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

    tables = Patch3DTables(
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
        jinv=jnp.asarray(np.stack([pd["jinv"] for pd in per_dev])),
        jxw=jnp.asarray(np.stack([pd["jxw"] for pd in per_dev])),
        h=jnp.asarray(np.stack([pd["h"] for pd in per_dev])),
        gather_nodes=jnp.asarray(np.stack([pd["gn"] for pd in per_dev])),
        compress=tuple(jnp.asarray(compress[K]) for K in Ks),
    )
    lin_idx = jnp.asarray(
        np.stack([pd["gl"] for pd in per_dev])
    ).reshape(n_dev, n_groups * PlY, GXn, HZn)
    return HaloPatch3DArgs(tables=tables, oslot=jnp.asarray(oslot)), \
        sweep, lin_idx
