"""Distributed patch-2D fast path: the patch-lattice Pallas sweep as the
halo local sweep on general 2D meshes.

The 2D sibling of parallel/halo_prism.py (the TPU answer to the
reference's simultaneous matrix-free + MPI hot kernel,
``operator_ns.cc:702-717``) for Turek 2D and friends: partition the
mesh by PATCH (contiguous Morton-ordered runs of refinement patches per
device), pack per-device :class:`~ns_gls_tpu.ops.patch2d.Patch2DTables`
against the device's halo window (uniform shapes across devices: patch
slots and seam-compress classes padded to the device maximum, pads
pointing at zero rows), and run the fused kernel per device inside the
halo ``shard_map``.  The seam-compressed output scatter-adds into the
window by node slot; the standard reverse ghost exchange then sums the
inter-device seam partials at the owners — collective volume stays
O(halo).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ns_gls_tpu.ops.patch2d import (
    Patch2DSweep,
    Patch2DTables,
    _band_1d,
    _block_diag,
    _pick_GH,
)


class HaloPatch2DArgs(NamedTuple):
    """Device-major patch-2D tables + output scatter map.

    ``tables.gather_nodes`` holds local WINDOW SLOTS (pads -> ``n_loc``,
    the zero row appended to the window before the gather).  ``oslot``
    lists, in the seam-compress class-concatenation order of the kernel
    output, the window slot of every local 2D node (pads -> ``n_loc``).
    """

    tables: Patch2DTables
    oslot: jnp.ndarray      # (n_dev, n_cat) int32


def _morton2d(pts: np.ndarray) -> np.ndarray:
    lo, hi = pts.min(0), pts.max(0)
    span = np.where(hi - lo > 0, hi - lo, 1.0)
    q = ((pts - lo) / span * ((1 << 16) - 1)).astype(np.uint64)
    code = np.zeros(len(pts), dtype=np.uint64)
    for bit in range(16):
        for d in range(2):
            code |= ((q[:, d] >> np.uint64(bit)) & np.uint64(1)) << np.uint64(
                bit * 2 + d
            )
    return np.argsort(code, kind="stable")


def patch2d_partition(space, n_dev: int):
    """Partition the 2D mesh by patch (contiguous Morton runs of patch
    centers).  Returns (cells_of, patches_of) or None when infeasible."""
    n_patches = space.n_patches
    if n_patches < n_dev:
        return None
    mesh = space.mesh
    c2 = mesh.vertices[mesh.cells].mean(axis=1)
    pc = np.zeros((n_patches, 2))
    cnt = np.zeros(n_patches)
    np.add.at(pc, space.patch_of_cell2d, c2)
    np.add.at(cnt, space.patch_of_cell2d, 1)
    pc /= cnt[:, None]
    perm = _morton2d(pc)
    patches_of = np.array_split(perm, n_dev)
    if any(len(pl) == 0 for pl in patches_of):
        return None
    pdev = np.empty(n_patches, np.int64)
    for d, pl in enumerate(patches_of):
        pdev[pl] = d
    cells_of = [
        np.nonzero(pdev[space.patch_of_cell2d] == d)[0] for d in range(n_dev)
    ]
    return cells_of, patches_of


class _LocalView:
    pass


def build_halo_patch2d(op, patches_of, g2l: np.ndarray, n_loc: int):
    """Per-device patch-2D tables for the halo local sweep.

    Returns (HaloPatch2DArgs, local Patch2DSweep, lin_idx) or None when
    the operator is not patch2d-compatible.  ``lin_idx`` is the
    (n_dev, n_groups, GXn, HYn) GLOBAL node gather map used to localize
    the linearization/history plane tensors (pads -> n_nodes, the zero
    row)."""
    if getattr(op, "_p2sweep", None) is None:
        return None
    space = op.space
    if len(getattr(space, "patch2d_families", [])) > 1:
        # adaptive multi-family meshes: the distributed wrapper keys on
        # the single-family layout; fall back to the general halo sweep
        return None
    n_dev = len(patches_of)
    P = space.degree
    NQ = space.n_q1d
    mx = my = space.patch_cells
    Xn = Yn = P * mx + 1
    n_pp = max(len(pl) for pl in patches_of)
    C = space.dim + 1

    lv = _LocalView()
    lv.space = _LocalView()
    lv.space.dim = space.dim
    lv.space.degree = P
    lv.space.n_q1d = NQ
    lv.space.patch_cells = mx
    lv.space.n_patches = n_pp
    lv.space.n2d = 0                     # set after the class layout
    lv.space.patch2d = True
    lv.consider_time_derivative = op.consider_time_derivative
    lv.cell_wise_stabilization = op.cell_wise_stabilization
    lv.nu, lv.c_1, lv.c_2 = op.nu, op.c_1, op.c_2
    lv.structured_precision = getattr(op, "structured_precision", "3x")
    sweep = Patch2DSweep(op=lv)
    G, H = sweep.G, sweep.H
    GH = G * H
    n_groups = sweep.n_groups
    GXn, HYn = sweep.GXn, sweep.HYn
    Lx, Ly = NQ * mx, NQ * my
    RGx, LHy = sweep.RGx, sweep.LHy
    zero_flat = n_groups * GXn * HYn

    bS, bD, qw = _band_1d(P, NQ, mx)
    bxS, bxD = _block_diag(bS, G), _block_diag(bD, G)
    byS = _block_diag(bS.T.copy(), H)
    byD = _block_diag(bD.T.copy(), H)

    jinv = np.asarray(space.jinv, np.float32)
    jxw = np.asarray(space.jxw, np.float32)
    h1_all = np.asarray(space.cell_h_min_vertex, np.float32)
    hq_all = np.asarray(
        np.sqrt(4.0 * space.cell_measure / np.pi) / P, np.float32
    )
    patch_of = space.patch_of_cell2d
    lat_of = space.lattice_of_cell2d
    pn_all = space.patch_nodes.astype(np.int64)   # (n_patches, Yn, Xn)
    qx = np.arange(NQ)

    per_dev = []
    for d in range(n_dev):
        pl = np.asarray(patches_of[d])
        slot_of = np.full(space.n_patches, -1, np.int64)
        slot_of[pl] = np.arange(len(pl))
        sel = np.nonzero(slot_of[patch_of] >= 0)[0]
        cs = slot_of[patch_of[sel]]
        ci = (cs % GH) // H
        cj = (cs % GH) % H
        cg = cs // GH
        lat = lat_of[sel]
        rows = (ci[:, None] * Lx + qx[None, :] * mx + lat[:, 0:1])
        lanes = (cj[:, None] * Ly + qx[None, :] * my + lat[:, 1:2])
        jinv_t = np.zeros((n_groups, 4, RGx, LHy), np.float32)
        jxw_t = np.zeros((n_groups, RGx, LHy), np.float32)
        h_t = np.ones((n_groups, 2, RGx, LHy), np.float32)
        r_idx = rows[:, None, :]
        l_idx = lanes[:, :, None]
        q_idx = qx[None, None, :] + NQ * qx[None, :, None]
        cgb = cg[:, None, None]
        csel = sel[:, None, None]
        for r in range(2):
            for x in range(2):
                jinv_t[cgb, r * 2 + x, r_idx, l_idx] = (
                    jinv[csel, q_idx, r, x]
                )
        jxw_t[cgb, r_idx, l_idx] = jxw[csel, q_idx]
        h_t[cgb, 0, r_idx, l_idx] = h1_all[sel][:, None, None]
        h_t[cgb, 1, r_idx, l_idx] = hq_all[sel][:, None, None]

        # window-slot gather table + global-node lin table
        pg = np.arange(len(pl)) // GH
        pi = (np.arange(len(pl)) % GH) // H
        pj = (np.arange(len(pl)) % GH) % H
        xs = np.arange(Xn)
        ys = np.arange(Yn)
        gn = np.full((n_groups, GXn, HYn), n_loc, np.int32)
        gl_glob = np.full((n_groups, GXn, HYn), space.n_nodes, np.int32)
        gr = pi[:, None, None] * Xn + xs[None, None, :]
        gl = pj[:, None, None] * Yn + ys[None, :, None]
        pn = pn_all[pl]                                  # (n_p, Yn, Xn)
        g2l_d = g2l[d]
        loc = g2l_d[pn]
        assert (loc < n_loc).all(), "patch node outside cell-touched window"
        gn[pg[:, None, None], gr, gl] = loc
        gl_glob[pg[:, None, None], gr, gl] = pn
        # per-device flat occurrence maps of each local node
        flat = (pg[:, None, None] * GXn + gr) * HYn + gl  # (p, Yn, Xn)
        nodes_f = pn.reshape(-1)
        flats_f = flat.reshape(-1)
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

    # unified multiplicity-class layout across devices
    Ks = sorted({int(k) for pd in per_dev for k in np.unique(pd["counts"])})
    nk_max = {
        K: max(int((pd["counts"] == K).sum()) for pd in per_dev) for K in Ks
    }
    n_cat = sum(nk_max.values())
    lv.space.n2d = sweep.n2d = n_cat     # kernel output rows per device

    compress = {K: np.full((n_dev, nk_max[K], K), zero_flat, np.int32)
                for K in Ks}
    oslot = np.full((n_dev, n_cat), n_loc, np.int32)
    for d, pd in enumerate(per_dev):
        off = 0
        for K in Ks:
            m = pd["counts"] == K
            nodes_k = np.nonzero(m)[0]
            for j, ui in enumerate(nodes_k):
                st = pd["starts"][ui]
                compress[K][d, j] = pd["s_flat"][st: st + K]
            oslot[d, off: off + len(nodes_k)] = pd["uloc"][nodes_k]
            off += nk_max[K]

    tables = Patch2DTables(
        bx_S=jnp.asarray(bxS),
        bx_D=jnp.asarray(bxD),
        bx_ST=jnp.asarray(bxS.T.copy()),
        bx_DT=jnp.asarray(bxD.T.copy()),
        by_S=jnp.asarray(byS),
        by_D=jnp.asarray(byD),
        by_ST=jnp.asarray(byS.T.copy()),
        by_DT=jnp.asarray(byD.T.copy()),
        jinv=jnp.asarray(np.stack([pd["jinv"] for pd in per_dev])),
        jxw=jnp.asarray(np.stack([pd["jxw"] for pd in per_dev])),
        h=jnp.asarray(np.stack([pd["h"] for pd in per_dev])),
        gather_nodes=jnp.asarray(np.stack([pd["gn"] for pd in per_dev])),
        compress=tuple(jnp.asarray(compress[K]) for K in Ks),
    )
    lin_idx = jnp.asarray(np.stack([pd["gl"] for pd in per_dev]))
    return HaloPatch2DArgs(tables=tables, oslot=jnp.asarray(oslot)), \
        sweep, lin_idx
