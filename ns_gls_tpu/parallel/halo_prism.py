"""Distributed prism fast path: the Pallas extrusion kernel as the halo
local sweep.

The reference's one hot kernel runs matrix-free AND MPI-distributed at
once (``operator_ns.cc:702-717``: cell_loop with overlapped ghost
exchange).  The TPU equivalent for the flagship extruded meshes
(Turek/Hoffmann 3D): partition the mesh by 2D PATCHES — whole z-columns
per device — so each device's halo window is itself a (local 2D factor)
x (full z lattice) product, and the fused prism sweep (ops/prism.py)
runs per device inside the halo ``shard_map``:

- the partition assigns contiguous Morton-ordered runs of 2D patches to
  devices; every 3D cell of a column lands on one device, so the sorted
  local window [owned | ghosts | trash] keeps each cell-touched 2D
  node's z-run contiguous (the product numbering is node2d*Nzn + z and
  no other node id falls inside a column's range),
- per-device :class:`~ns_gls_tpu.ops.prism.PrismTables` are packed for
  the local patch set (uniform shapes across devices: patch slots and
  seam-compress multiplicity classes padded to the device maximum, pads
  pointing at zero rows),
- the kernel's patch gather reads whole (column-start + z) windows of
  the halo buffer; its seam-compressed output scatter-adds back by
  column, after which the standard reverse ghost exchange sums the
  inter-device seam partials at the owners — collective volume stays
  O(halo) exactly as in the general path,
- the linearization/history plane tensors the kernel consumes are
  localized once per Newton point inside the cached one-dispatch state
  localization (parallel/halo.py ``_local_state``), not per apply.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ns_gls_tpu.ops.prism import (
    PrismSweep,
    PrismTables,
    _cg_rank,
    pack_prism_geometry,
    prism_bands,
    prism_cell_geometry,
)


class HaloPrismArgs(NamedTuple):
    """Device-major prism tables + output scatter map for the halo sweep.

    ``tables.gather_nodes`` holds window COLUMN-START SLOTS (not 2D node
    ids): entry (gg, y, g, x) is the local window slot of z=0 of the
    patch-lattice node, or ``n_loc`` for pads (the zero region appended
    to the window before the gather).  ``oslot`` lists, in the seam-
    compress class-concatenation order of the kernel output, the window
    column-start slot of every local 2D node (pads -> ``n_loc``, which
    lands in the scrap rows of the scatter buffer).
    """

    tables: PrismTables
    oslot: jnp.ndarray      # (n_dev, n2d_cat) int32


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


def prism_patch_partition(space, n_dev: int):
    """Partition the extruded mesh by 2D patches (whole z-columns per
    device).  Returns (cells_of, patches_of) or None when infeasible.
    The SFC runs over patch centers — the 2D analogue of the p4est
    partition (``main.cc:230-233``) at patch granularity."""
    n_patches = space.n_patches
    if n_patches < n_dev:
        return None
    m2 = space.mesh.extr_mesh2d
    c2 = m2.vertices[m2.cells].mean(axis=1)          # fine 2D cell centers
    pc = np.zeros((n_patches, 2))
    cnt = np.zeros(n_patches)
    np.add.at(pc, space.patch_of_cell2d, c2)
    np.add.at(cnt, space.patch_of_cell2d, 1)
    pc /= cnt[:, None]
    perm = _morton2d(pc)
    # balanced contiguous split: every device gets floor or ceil patches
    patches_of = np.array_split(perm, n_dev)
    if any(len(pl) == 0 for pl in patches_of):
        return None
    pdev = np.empty(n_patches, np.int64)
    for d, pl in enumerate(patches_of):
        pdev[pl] = d
    p3 = space.patch_of_cell2d[space.mesh.extr_cell2d]   # per 3D cell
    dev3 = pdev[p3]
    cells_of = [np.nonzero(dev3 == d)[0] for d in range(n_dev)]
    return cells_of, patches_of


class _LocalView:
    pass


def build_halo_prism(op, patches_of, g2l: np.ndarray, n_loc: int):
    """Per-device prism tables for the halo local sweep.

    Returns (HaloPrismArgs, local PrismSweep, lin_idx2d) or None when the
    operator is not prism-compatible.  ``lin_idx2d`` is the (n_dev, nGP,
    XrG) GLOBAL 2D-node gather map used to localize the linearization /
    history plane tensors (pads -> n2d, the zero row)."""
    geo = prism_cell_geometry(op)
    if geo is None:
        return None
    space = op.space
    n_dev = len(patches_of)
    P = space.degree
    NQ = space.n_q1d
    mx = my = space.patch_cells
    nz = space.nz_cells
    Nzn = space.nz_nodes
    Xr = P * mx + 1
    Xn = P * mx + 1
    PlY = P * my + 1
    n_pp = max(len(pl) for pl in patches_of)

    # local sweep sized for the maximum per-device patch count; all
    # devices share one kernel program (shard_map traces once)
    lv = _LocalView()
    lv.space = _LocalView()
    lv.space.dim = space.dim
    lv.space.degree = P
    lv.space.n_q1d = NQ
    lv.space.patch_cells = mx
    lv.space.nz_cells = nz
    lv.space.nz_nodes = Nzn
    lv.space.n_patches = n_pp
    lv.space.n2d = 0                     # set after the class layout below
    lv.consider_time_derivative = op.consider_time_derivative
    lv.cell_wise_stabilization = op.cell_wise_stabilization
    lv.nu, lv.c_1, lv.c_2 = op.nu, op.c_1, op.c_2
    lv.structured_precision = getattr(op, "structured_precision", "3x")
    sweep = PrismSweep(lv)
    G, n_groups = sweep.G, sweep.n_groups
    XrG = G * Xr
    nGP = n_groups * PlY
    dims = dict(NQ=NQ, mx=mx, my=my, G=G, n_groups=n_groups)
    zero_flat = n_groups * PlY * XrG     # the appended zero row in apply()

    bands = prism_bands(P, NQ, mx, nz, Nzn, G)
    cgy = _cg_rank(np.arange(Xn), my, P)
    cgx = _cg_rank(np.arange(Xn), mx, P)
    pn_all = space.patch_nodes.astype(np.int64)      # (n_patches, Xn, Xn)
    patch_of = space.patch_of_cell2d
    lat_of = space.lattice_of_cell2d

    per_dev = []
    for d in range(n_dev):
        pl = np.asarray(patches_of[d])
        n_p = len(pl)
        slot_of = np.full(space.n_patches, -1, np.int64)
        slot_of[pl] = np.arange(n_p)
        sel = np.nonzero(slot_of[patch_of] >= 0)[0]
        jinv2, jxw2, hp = pack_prism_geometry(
            geo, sel, slot_of[patch_of[sel]], lat_of[sel], dims
        )

        pn = pn_all[pl]                               # (n_p, Xn, Xn)
        g2l_d = g2l[d]
        col0 = g2l_d[pn * Nzn]                        # window z=0 slots
        # column contiguity: the product numbering + column partition
        # guarantee it; assert cheaply on the last z node
        assert (col0 < n_loc).all(), "patch node outside cell-touched window"
        assert (g2l_d[pn * Nzn + (Nzn - 1)] == col0 + Nzn - 1).all(), \
            "window z-columns not contiguous"

        s = np.arange(n_p)
        gg, g = s // G, s % G
        gn = np.full((n_groups, PlY, G, Xr), n_loc, np.int32)
        gn[gg[:, None, None], cgy[None, :, None], g[:, None, None],
           cgx[None, None, :]] = col0
        flat = (((gg[:, None, None] * PlY + cgy[None, :, None]) * G
                 + g[:, None, None]) * Xr + cgx[None, None, :])

        nodes_f = pn.reshape(-1)
        flats_f = flat.reshape(-1)
        order = np.argsort(nodes_f, kind="stable")
        s_nodes = nodes_f[order]
        s_flat = flats_f[order]
        uniq, starts, counts = np.unique(
            s_nodes, return_index=True, return_counts=True
        )
        per_dev.append(dict(
            jinv2=jinv2, jxw2=jxw2, h=hp, gn=gn,
            uniq=uniq, starts=starts, counts=counts, s_flat=s_flat,
            ucol=g2l_d[uniq * Nzn],
        ))

    # unified multiplicity-class layout across devices
    Ks = sorted({int(k) for pd in per_dev for k in np.unique(pd["counts"])})
    nk_max = {
        K: max(int((pd["counts"] == K).sum()) for pd in per_dev) for K in Ks
    }
    n2d_cat = sum(nk_max.values())
    lv.space.n2d = sweep.n2d = n2d_cat   # kernel output rows per device

    compress = {K: np.full((n_dev, nk_max[K], K), zero_flat, np.int32)
                for K in Ks}
    oslot = np.full((n_dev, n2d_cat), n_loc, np.int32)
    lin_idx = np.full((n_dev, nGP, XrG), space.n2d, np.int32)
    for d, pd in enumerate(per_dev):
        off = 0
        for K in Ks:
            m = pd["counts"] == K
            nodes_k = np.nonzero(m)[0]            # indices into uniq
            for j, ui in enumerate(nodes_k):
                st = pd["starts"][ui]
                compress[K][d, j] = pd["s_flat"][st: st + K]
            oslot[d, off: off + len(nodes_k)] = pd["ucol"][nodes_k]
            off += nk_max[K]
        # global-2D gather map for the linearization planes: same layout
        # as gn but carrying global node ids
        gn_glob = np.full((n_groups, PlY, G, Xr), space.n2d, np.int32)
        pl = np.asarray(patches_of[d])
        s = np.arange(len(pl))
        gg, g = s // G, s % G
        gn_glob[gg[:, None, None], cgy[None, :, None], g[:, None, None],
                cgx[None, None, :]] = pn_all[pl]
        lin_idx[d] = gn_glob.reshape(nGP, XrG)

    tables = PrismTables(
        band_S=jnp.asarray(bands["band_S"]),
        band_D=jnp.asarray(bands["band_D"]),
        bx_S=jnp.asarray(bands["bx_S"]),
        bx_D=jnp.asarray(bands["bx_D"]),
        bx_ST=jnp.asarray(bands["bx_S"].T.copy()),
        bx_DT=jnp.asarray(bands["bx_D"].T.copy()),
        S1=jnp.asarray(bands["S1"]),
        D1=jnp.asarray(bands["D1"]),
        wz=jnp.asarray(bands["wz"]),
        jinv2=jnp.asarray(np.stack([pd["jinv2"] for pd in per_dev])),
        jxw2=jnp.asarray(np.stack([pd["jxw2"] for pd in per_dev])),
        h=jnp.asarray(np.stack([pd["h"] for pd in per_dev])),
        gather_nodes=jnp.asarray(np.stack([pd["gn"] for pd in per_dev])),
        compress=tuple(jnp.asarray(compress[K]) for K in Ks),
    )
    return HaloPrismArgs(tables=tables, oslot=jnp.asarray(oslot)), sweep, \
        jnp.asarray(lin_idx)
