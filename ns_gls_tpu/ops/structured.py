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
- the z overlap between slabs is handled by passing the solution array
  once per local plane with shifted BlockSpec index maps (the pipeline
  prefetches each plane; neighboring slabs share one class-0 plane),
- q-point physics runs on ``(ny, NQ*nx)`` tiles — cells on lanes, the
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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class StructuredTables(NamedTuple):
    """Device tables (lattice cell order, lanes pre-tiled to (qx, nx))."""

    band_S: jnp.ndarray   # (Nx, NQ*nx)
    band_D: jnp.ndarray   # (Nx, NQ*nx)
    S1: jnp.ndarray       # (NQ, P+1)  (SMEM)
    D1: jnp.ndarray       # (NQ, P+1)  (SMEM)
    jinv: jnp.ndarray     # (d*d, n_slabs, ny_s, NQ*nx)
    jxw: jnp.ndarray      # (NQ**(d-1), n_slabs, ny_s, NQ*nx)
    h: jnp.ndarray        # (2, n_slabs, ny_s, NQ*nx)


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

    # cells in (slab-major, y, x) order: slabs are z layers (3D) or y rows
    # (2D, degenerate per-slab y extent 1)
    lat = space.mesh.lattice
    perm = np.lexsort(tuple(lat[:, k] for k in range(d)))
    if d == 3:
        cshape = (cs[2], cs[1], nx)   # (nz, ny, nx)
    else:
        cshape = (cs[1], 1, nx)       # (ny, 1, nx)

    def pack_cell(arr):
        """(n_c,) or (n_c, m) mesh order -> (m, n_slabs, ny_s, L)."""
        a = np.asarray(arr)[perm]
        if a.ndim == 1:
            a = a[:, None]
        a = a.reshape(cshape + (a.shape[1],))
        a = np.moveaxis(a, -1, 0)
        return np.tile(a, (1, 1, 1, NQ)).astype(np.float32)

    jinvP = pack_cell(
        np.asarray(space.jinv)[:, 0].reshape(space.mesh.n_cells, d * d)
    )

    # jxw: element q index = qx + NQ*qy (+ NQ^2*qz); lanes hold (qx, nx);
    # the leading dim enumerates the remaining (qz, qy) combos, qz-major
    jxw = np.asarray(space.jxw)[perm]            # (n_c, n_q)
    n_rest = NQ ** (d - 1)
    jxwP = np.zeros((n_rest,) + cshape[:2] + (L,), np.float32)
    for rest in range(n_rest):
        qy = rest % NQ
        qz = rest // NQ
        for qx in range(NQ):
            q = qx + NQ * qy + (NQ * NQ * qz if d == 3 else 0)
            jxwP[rest, :, :, qx * nx:(qx + 1) * nx] = jxw[:, q].reshape(
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
        S1=jnp.asarray(S1.astype(np.float32)),
        D1=jnp.asarray(D1.astype(np.float32)),
        jinv=jnp.asarray(jinvP),
        jxw=jnp.asarray(jxwP),
        h=jnp.asarray(hP),
    )


# ---------------------------------------------------------------------------
# q-point physics on tiles (mirrors qpoint_fixed_point / qpoint_increment,
# which mirror operator_ns.cc:949-1182)
# ---------------------------------------------------------------------------
def _physics(d, flavor, sc, u_val, u_grad, p_val, p_grad,
             u_star, gus, gps, dt_old, d1, d2, consider_dt):
    w = sc["weight"]
    nu = sc["nu"]

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


# ---------------------------------------------------------------------------
# the kernel: grid over slabs (z-cell layers in 3D, y-cell rows in 2D)
# ---------------------------------------------------------------------------
def _make_kernel(dims, flavor, consider_dt, cell_wise, prec):
    d = dims["d"]
    P = dims["P"]
    NQ = dims["NQ"]
    nx = dims["nx"]
    ny = dims["ny"]          # per-slab y cell count (2D: 1)
    C = dims["C"]
    L = NQ * nx
    yoff = _class_offsets(P, ny)
    need_lin_grads = flavor == "increment"
    need_dt_old = consider_dt and flavor in ("increment", "residual")
    n_pl = P + 1             # slab-local planes
    dd = d * d

    def yrow0(j):
        return yoff[j % P] + (1 if j == P else 0)

    def kernel(*refs):
        it = iter(refs)
        scal_ref = next(it)
        s1_ref = next(it)
        d1t_ref = next(it)
        bs_ref = next(it)
        bd_ref = next(it)
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
        bs = bs_ref[:]
        bd = bd_ref[:]
        jinvL = [jinv_ref[r, 0] for r in range(dd)]   # (ny_s, L)
        h1 = h_ref[0, 0]
        hq = h_ref[1, 0]

        def fwd(plane_refs, lead, grads):
            """x-banded plane tensors: S[c][k] (Yr, L), D likewise."""
            S = [[None] * n_pl for _ in range(lead)]
            D = [[None] * n_pl for _ in range(lead)] if grads else None
            for c in range(lead):
                for k in range(n_pl):
                    t = plane_refs[k][c, 0]
                    S[c][k] = jnp.dot(
                        t, bs, preferred_element_type=jnp.float32,
                        precision=prec,
                    )
                    if grads:
                        D[c][k] = jnp.dot(
                            t, bd, preferred_element_type=jnp.float32,
                            precision=prec,
                        )
            return S, D

        def yslice(t, j):
            if d == 2:
                return t
            r0 = yrow0(j)
            return t[r0:r0 + ny]

        US, UD = fwd(u_refs, C, True)
        ULS, ULD = fwd(ul_refs, C, need_lin_grads)
        VOS = fwd(vo_refs, d, False)[0] if need_dt_old else None

        def q3(planes, qz, qy, tabz, taby):
            """3D: sum_{k,j} tabz[qz,k] taby[qy,j] yslice(planes[k], j)."""
            acc = None
            for k in range(n_pl):
                for j in range(n_pl):
                    t = (tabz[qz, k] * taby[qy, j]) * yslice(planes[k], j)
                    acc = t if acc is None else acc + t
            return acc

        def q2(planes, qy, tab):
            """2D: sum_k tab[qy,k] planes[k] (slab planes ARE the y dir)."""
            acc = None
            for k in range(n_pl):
                t = tab[qy, k] * planes[k]
                acc = t if acc is None else acc + t
            return acc

        if d == 3:
            combos = [(qz, qy) for qz in range(NQ) for qy in range(NQ)]

            def interp(planes, qz, qy, ztab, ytab):
                return q3(planes, qz, qy, ztab, ytab)
        else:
            combos = [(0, qy) for qy in range(NQ)]

            def interp(planes, qz, qy, ztab, ytab):
                return q2(planes, qy, ztab)

        # u* values and |u*|^2 at every (qz, qy)
        ustar = {}
        usq = {}
        for (qz, qy) in combos:
            us = [interp(ULS[a], qz, qy, s1_ref, s1_ref) for a in range(d)]
            ustar[(qz, qy)] = us
            usq[(qz, qy)] = sum(u * u for u in us)

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

        accS = [[[None] * n_pl for _ in range(n_pl)] for _ in range(C)]
        accD = [[[None] * n_pl for _ in range(n_pl)] for _ in range(C)]

        for (qz, qy) in combos:
            u_val = []
            u_gref = []
            for c in range(C):
                u_val.append(interp(US[c], qz, qy, s1_ref, s1_ref))
                if d == 3:
                    u_gref.append([
                        q3(UD[c], qz, qy, s1_ref, s1_ref),   # d/dxi_x
                        q3(US[c], qz, qy, s1_ref, d1t_ref),  # d/dxi_y
                        q3(US[c], qz, qy, d1t_ref, s1_ref),  # d/dxi_z
                    ])
                else:
                    u_gref.append([
                        q2(UD[c], qy, s1_ref),
                        q2(US[c], qy, d1t_ref),
                    ])

            def to_phys(gref):
                return [
                    sum(gref[r] * jinvL[r * d + x] for r in range(d))
                    for x in range(d)
                ]

            u_grad = [to_phys(u_gref[a]) for a in range(d)]
            p_grad = to_phys(u_gref[d])
            gus = gps = None
            if need_lin_grads:
                l_gref = []
                for c in range(C):
                    if d == 3:
                        l_gref.append([
                            q3(ULD[c], qz, qy, s1_ref, s1_ref),
                            q3(ULS[c], qz, qy, s1_ref, d1t_ref),
                            q3(ULS[c], qz, qy, d1t_ref, s1_ref),
                        ])
                    else:
                        l_gref.append([
                            q2(ULD[c], qy, s1_ref),
                            q2(ULS[c], qy, d1t_ref),
                        ])
                gus = [to_phys(l_gref[a]) for a in range(d)]
                gps = to_phys(l_gref[d])
            dt_old = ([interp(VOS[a], qz, qy, s1_ref, s1_ref)
                       for a in range(d)] if need_dt_old else None)

            if cell_wise:
                d1_q, d2_q = d1_t, d2_t
            else:
                d1_q, d2_q = _delta(sc, h1, hq, None, usq[(qz, qy)], False)

            val_res, grad_res = _physics(
                d, flavor, sc, u_val[:d], u_grad, u_val[d], p_grad,
                ustar[(qz, qy)], gus, gps, dt_old, d1_q, d2_q, consider_dt,
            )

            rest = qz * NQ + qy if d == 3 else qy
            jxw_t = jxw_ref[rest, 0]
            for c in range(C):
                w_val = val_res[c] * jxw_t
                gref = [
                    sum(grad_res[c][x] * jinvL[r * d + x]
                        for x in range(d)) * jxw_t
                    for r in range(d)
                ]
                for k in range(n_pl):
                    if d == 3:
                        sz = s1_ref[qz, k]
                        dz = d1t_ref[qz, k]
                        pk_S = sz * w_val + dz * gref[2]
                        pk_Dy = sz * gref[1]
                        pk_Dx = sz * gref[0]
                        for j in range(n_pl):
                            sy = s1_ref[qy, j]
                            dy = d1t_ref[qy, j]
                            tS = sy * pk_S + dy * pk_Dy
                            tD = sy * pk_Dx
                            accS[c][k][j] = (
                                tS if accS[c][k][j] is None
                                else accS[c][k][j] + tS
                            )
                            accD[c][k][j] = (
                                tD if accD[c][k][j] is None
                                else accD[c][k][j] + tD
                            )
                    else:
                        sy = s1_ref[qy, k]
                        dy = d1t_ref[qy, k]
                        tS = sy * w_val + dy * gref[1]
                        tD = sy * gref[0]
                        accS[c][k][0] = (
                            tS if accS[c][k][0] is None
                            else accS[c][k][0] + tS
                        )
                        accD[c][k][0] = (
                            tD if accD[c][k][0] is None
                            else accD[c][k][0] + tD
                        )

        def yfold(rows):
            """(P+1) local-j tiles (ny, L) -> (Yr, L) class-grouped."""
            if d == 2:
                return rows[0]
            zrow = 0.0 * rows[0][:1]
            cls0 = (jnp.concatenate([rows[0], zrow], axis=0)
                    + jnp.concatenate([zrow, rows[P]], axis=0))
            parts = [rows[j] for j in range(1, P)] + [cls0]
            return (jnp.concatenate(parts, axis=0)
                    if len(parts) > 1 else cls0)

        for c in range(C):
            planes = []
            for k in range(n_pl):
                fS = yfold(accS[c][k])
                fD = yfold(accD[c][k])
                planes.append(
                    jnp.dot(fS, bs.T, preferred_element_type=jnp.float32,
                            precision=prec)
                    + jnp.dot(fD, bd.T, preferred_element_type=jnp.float32,
                              precision=prec)
                )
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
    ``(C, Zr, Yr, Nx)`` (free reshapes of the class-grouped node vectors)
    and returns the result in the same layout.
    """

    def __init__(self, op, interpret: bool | None = None):
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
        self.prec = jax.lax.Precision.HIGHEST
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
        n_slabs = self.n_slabs
        kernel = _make_kernel(
            dict(d=d, P=P, NQ=NQ, nx=nx, ny=ny, C=C),
            flavor, self.consider_dt, self.cell_wise, self.prec,
        )

        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        vmem_full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

        def cell_spec(lead):
            return pl.BlockSpec(
                (lead, 1, ny, L), lambda s: (0, s, 0, 0),
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
             cell_spec(d * d), cell_spec(NQ ** (d - 1)), cell_spec(2)]
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
        args = (
            [scal, tables.S1, tables.D1, tables.band_S, tables.band_D,
             tables.jinv, tables.jxw, tables.h]
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
