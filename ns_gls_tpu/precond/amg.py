"""Algebraic multigrid preconditioner (aggregation-based).

TPU-native replacement for the reference's Trilinos ML-AMG
(``preconditioner.cc:38-77``; coarse-solver zoo ``multigrid.cc:372-433``):

- setup on host: assemble the sparse matrix, build node aggregates on the
  strength-of-connection graph, P = piecewise-constant per aggregate and
  per component (exactly the "constant modes" near-nullspace the reference
  feeds ML), Galerkin coarse matrices RAP, recurse to a small coarsest
  level solved by dense LU,
- apply on device: one jitted V-cycle; level matrices in padded-ELL form
  (dense gathers + einsum — no dynamic sparsity), Jacobi smoothing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class AMGLevel(NamedTuple):
    ell_cols: jnp.ndarray   # (n, max_nnz) int32
    ell_vals: jnp.ndarray   # (n, max_nnz)
    inv_diag: jnp.ndarray   # (n,)
    omega: jnp.ndarray      # ()
    agg: jnp.ndarray        # (n,) int32 aggregate of each dof (next level)
    # ILU smoother factors ("amg smoother": "ilu"; reference ML-AMG
    # smooths with Ifpack ILU, ``preconditioner.cc:49-77``): strict-lower
    # L / strict-upper U in padded ELL + 1/diag(U) + the SuperLU row/col
    # permutations. Empty tuple in Jacobi mode (pytree-stable).
    ilu: tuple = ()         # (l_cols, l_vals, u_cols, u_vals, udi, ipr, pc)


class AMGArgs(NamedTuple):
    levels: tuple
    coarse_lu: tuple
    fine_args: tuple = ()   # matrix-free level-0 mode: the operator args

    @property
    def n_coarse(self) -> int:  # static (from array shape, not a leaf)
        return self.coarse_lu[0].shape[0]


def _ilu_factors(A, dtype):
    """SuperLU incomplete factors of a level matrix in device form:
    strict-lower/strict-upper padded ELL, inverted U diagonal, and the
    inverse row / forward column permutations so the device apply is
    ``x = (U^-1 L^-1 r[ipr])[pc]`` (composition verified numerically)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    ilu = spla.spilu(A.tocsc(), drop_tol=1e-5, fill_factor=3.0)
    L = ilu.L.tocsr()
    U = ilu.U.tocsr()
    n = A.shape[0]
    Ls = (L - sp.eye(n)).tocsr()
    Ls.eliminate_zeros()
    ud = U.diagonal()
    Us = (U - sp.diags(ud)).tocsr()
    Us.eliminate_zeros()
    l_cols, l_vals = _to_ell(Ls, dtype)
    u_cols, u_vals = _to_ell(Us, dtype)
    ipr = np.empty(n, np.int64)
    ipr[ilu.perm_r] = np.arange(n)
    udi = np.where(np.abs(ud) > 1e-300, 1.0 / ud, 1.0)
    return (
        l_cols, l_vals, u_cols, u_vals,
        jnp.asarray(udi, dtype),
        jnp.asarray(ipr.astype(np.int32)),
        jnp.asarray(ilu.perm_c.astype(np.int32)),
    )


def _strength_aggregates(A, theta=0.08):
    """Greedy aggregation on the strength graph of a CSR matrix."""
    import scipy.sparse as sp

    n = A.shape[0]
    d = np.sqrt(np.abs(A.diagonal()) + 1e-300)
    agg = np.full(n, -1, dtype=np.int64)
    indptr, indices, data = A.indptr, A.indices, A.data
    next_agg = 0

    def strong_neighbors(i):
        s, e = indptr[i], indptr[i + 1]
        cols = indices[s:e]
        vals = np.abs(data[s:e])
        mask = (cols != i) & (vals > theta * d[i] * d[cols])
        return cols[mask]

    # pass 1: roots
    for i in range(n):
        if agg[i] != -1:
            continue
        nbrs = strong_neighbors(i)
        if (agg[nbrs] == -1).all():
            agg[i] = next_agg
            agg[nbrs] = next_agg
            next_agg += 1
    # pass 2: attach leftovers to a neighboring aggregate
    for i in range(n):
        if agg[i] != -1:
            continue
        nbrs = strong_neighbors(i)
        hit = nbrs[agg[nbrs] != -1]
        if len(hit):
            agg[i] = agg[hit[0]]
        else:
            agg[i] = next_agg
            next_agg += 1
    return agg, next_agg


def _to_ell(A, dtype):
    import scipy.sparse as sp

    A = A.tocsr()
    A.sum_duplicates()
    n = A.shape[0]
    nnz_per_row = np.diff(A.indptr)
    k = max(int(nnz_per_row.max()), 1)
    cols = np.tile(np.arange(n, dtype=np.int64)[:, None], (1, k))
    vals = np.zeros((n, k))
    for r in range(n):
        s, e = A.indptr[r], A.indptr[r + 1]
        cols[r, : e - s] = A.indices[s:e]
        vals[r, : e - s] = A.data[s:e]
    return (jnp.asarray(cols.astype(np.int32)), jnp.asarray(vals, dtype))


class PreconditionerAMG:
    """Aggregation AMG on the assembled (constrained) operator matrix."""

    def __init__(self, op, n_comp: int = None, max_coarse: int = 500,
                 max_levels: int = 10, n_smooth: int = 2, theta: float = 0.08,
                 matrix_free_fine: bool = False, smoother: str = "jacobi",
                 ilu_sweeps: int = 3):
        self.op = op
        self.n_comp = n_comp or op.n_comp
        self.max_coarse = max_coarse
        self.max_levels = max_levels
        self.n_smooth = n_smooth
        self.theta = theta
        # "jacobi" (TPU-native damped point smoother) or "ilu": per-level
        # ILU factors applied via `ilu_sweeps` fixed Jacobi-style sweeps
        # per triangular solve (Chow-Patel-style iterative triangular
        # solves — the TPU-parallel stand-in for the reference's
        # sequential Ifpack ILU smoother, ``preconditioner.cc:60``)
        assert smoother in ("jacobi", "ilu")
        self.smoother = smoother
        self.ilu_sweeps = ilu_sweeps
        # matrix-free level 0: smoother/residual on the finest AMG level
        # apply the OPERATOR instead of the assembled padded-ELL matrix.
        # The ELL spmv on an unaggregated Q2-3D level gathers ~460 entries
        # per dof row (~4 ns/row on TPU) — the matrix-free sweep is an
        # order of magnitude faster there, the 30+ MB level-0 ELL tables
        # disappear, and the linearization stays current between
        # hierarchy rebuilds. Aggregation/Galerkin levels 1+ still use the
        # assembled matrices (they are small).
        self.matrix_free_fine = bool(matrix_free_fine)
        self._args: AMGArgs | None = None
        self._build_vcycle()

    # ------------------------------------------------------------------
    # device value refresh (structure-frozen rebuilds)
    # ------------------------------------------------------------------
    @staticmethod
    def _csr_pattern(rows, cols, nn):
        """Canonical sorted CSR pattern + vectorized slot lookup key."""
        import scipy.sparse as sp

        P = sp.coo_matrix(
            (np.ones(len(rows)), (rows, cols)), shape=(nn, nn)
        ).tocsr()
        P.sum_duplicates()
        P.sort_indices()
        row_of = np.repeat(np.arange(nn), np.diff(P.indptr))
        key = row_of.astype(np.int64) * nn + P.indices
        return P, row_of, key

    def _build_refresh(self, rows_e, cols_e, mask, n):
        """Precompute the slot-map chain: element-matrix entries ->
        masked fine CSR -> Galerkin CSR per aggregation level (P has one
        unit entry per row, so RAP is a pure segment-sum) -> stored ELL /
        diagonal / coarsest-dense indices. Later initializes then refresh
        every matrix VALUE on device in one jitted dispatch — no
        element-matrix download, no host RAP, no ELL re-upload."""
        C = self.n_comp
        # level-0 canonical pattern + entry->slot map
        P0, row_of0, key0 = self._csr_pattern(rows_e, cols_e, n)
        slots_e = np.searchsorted(key0, rows_e.astype(np.int64) * n + cols_e)
        maskf = (mask[rows_e] & mask[cols_e]).astype(np.float64)
        base0 = np.zeros(P0.nnz)
        cdofs = np.nonzero(~mask)[0]
        if len(cdofs):
            dslots = np.searchsorted(key0, cdofs.astype(np.int64) * n + cdofs)
            base0[dslots] = 1.0

        pats = [(P0, row_of0)]
        tmaps = []
        nn_k = n
        for agg_dofs, n_agg in self._frozen_aggs:
            P, row_of = pats[-1]
            nn_next = n_agg * C
            r1 = agg_dofs[row_of]
            c1 = agg_dofs[P.indices]
            P1, row_of1, key1 = self._csr_pattern(r1, c1, nn_next)
            tmaps.append(
                (np.searchsorted(key1, r1.astype(np.int64) * nn_next + c1),
                 P1.nnz)
            )
            pats.append((P1, row_of1))
            nn_k = nn_next

        def ell_maps(P):
            nn = P.shape[0]
            width = max(int(np.diff(P.indptr).max()), 1)
            pos = np.arange(P.nnz) - np.repeat(P.indptr[:-1],
                                               np.diff(P.indptr))
            row_of = np.repeat(np.arange(nn), np.diff(P.indptr))
            flat = row_of * width + pos
            cols = np.tile(np.arange(nn, dtype=np.int64)[:, None],
                           (1, width))
            cols.reshape(-1)[flat] = P.indices
            diag = np.searchsorted(
                row_of.astype(np.int64) * nn + P.indices,
                np.arange(nn, dtype=np.int64) * (nn + 1),
            )
            return flat, cols.astype(np.int32), width, row_of, diag

        j = jnp.asarray
        lvl_maps = []
        ell_cols_frozen = []
        for k, (P, row_of) in enumerate(pats[:-1]):   # stored levels
            nn = P.shape[0]
            skip_ell = self.matrix_free_fine and k == 0
            flat, cols, width, row_of_, diag = ell_maps(P)
            lvl_maps.append(dict(
                nn=nn, width=width, skip_ell=skip_ell,
                flat=j(flat.astype(np.int32)),
                row_of=j(row_of_.astype(np.int32)),
                diag=j(diag.astype(np.int32)),
            ))
            ell_cols_frozen.append(
                jnp.zeros((nn, 0), jnp.int32) if skip_ell else j(cols)
            )
        Pl, row_ofl = pats[-1]
        coarse = dict(
            nn=Pl.shape[0],
            rows=j(row_ofl.astype(np.int32)),
            cols=j(Pl.indices.astype(np.int32)),
        )
        dtype = self.op.dtype
        # same dtype rule as the host path (TPU LU implements only F32)
        lu_dt = (
            jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
        )

        def impl(emat, slots_e, maskf, base0, tmaps_d):
            data = jnp.zeros(P0.nnz, dtype).at[slots_e].add(
                emat.reshape(-1) * maskf
            ) + base0
            datas = [data]
            for tmap, nnz1 in tmaps_d:
                datas.append(
                    jnp.zeros(nnz1, dtype).at[tmap].add(datas[-1])
                )
            out_lv = []
            for k, m in enumerate(lvl_maps):
                d_k = datas[k]
                if m["skip_ell"]:
                    vals = jnp.zeros((m["nn"], 0), dtype)
                else:
                    vals = jnp.zeros(
                        m["nn"] * m["width"], dtype
                    ).at[m["flat"]].set(d_k).reshape(m["nn"], m["width"])
                diag = d_k[m["diag"]]
                inv_diag = jnp.where(jnp.abs(diag) > 1e-12, 1.0 / diag, 1.0)
                rs = jnp.zeros(m["nn"], dtype).at[m["row_of"]].add(
                    jnp.abs(d_k)
                ) * jnp.abs(inv_diag)
                omega = 1.0 / jnp.maximum(rs.max(), 1.0)
                out_lv.append((vals, inv_diag, omega))
            dl = datas[-1]
            dense = jnp.zeros(
                (coarse["nn"], coarse["nn"]), lu_dt
            ).at[coarse["rows"], coarse["cols"]].set(dl.astype(lu_dt))
            lu = jax.scipy.linalg.lu_factor(dense)
            return tuple(out_lv), tuple(lu)

        maps_d = dict(
            slots_e=j(slots_e.astype(np.int32)),
            maskf=j(maskf.astype(np.float64), dtype=dtype),
            base0=j(base0, dtype=dtype),
            tmaps=tuple((j(t.astype(np.int32)), nz) for t, nz in tmaps),
        )
        fn = jax.jit(
            lambda emat, s=maps_d: impl(
                emat, s["slots_e"], s["maskf"], s["base0"], s["tmaps"]
            )
        )
        self._refresh_maps = maps_d
        self._refresh_fn = fn
        self._refresh_ell_cols = tuple(ell_cols_frozen)

    def _device_refresh(self):
        """Rebuild AMGArgs values on device (frozen structure)."""
        from ns_gls_tpu.ops.assembly import _cq_cell_tree

        op = self.op
        sel = getattr(self, "_refresh_sel", None)
        if sel is None:
            sel = jnp.arange(op.space.mesh.n_cells, dtype=jnp.int32)
            self._refresh_sel = sel
        emat = op._emat_all(
            op.batch.jinv, op.batch.jxw, _cq_cell_tree(op), sel
        )
        out_lv, lu = self._refresh_fn(emat)
        levels = tuple(
            AMGLevel(
                ell_cols=self._refresh_ell_cols[k],
                ell_vals=vals,
                inv_diag=inv_diag,
                omega=omega,
                agg=jnp.asarray(
                    self._frozen_aggs[k][0].astype(np.int32)
                ),
                ilu=(),
            )
            for k, (vals, inv_diag, omega) in enumerate(out_lv)
        )
        self._args = AMGArgs(
            levels=levels, coarse_lu=lu,
            fine_args=(op.vmult_args if self.matrix_free_fine else ()),
        )
        self._n_levels = len(levels)

    def initialize(self):
        import scipy.sparse as sp

        from ns_gls_tpu.ops.assembly import element_matrices

        if getattr(self, "_refresh_fn", None) is not None:
            # structure-frozen device value refresh (one dispatch)
            self._device_refresh()
            return

        op = self.op
        C = self.n_comp
        emat = element_matrices(op)
        gdofs = (
            np.asarray(op.batch.cell_nodes)[:, :, None] * C
            + np.arange(C)[None, None, :]
        ).reshape(len(emat), -1)
        nl = gdofs.shape[1]
        rows = np.repeat(gdofs, nl, axis=1).reshape(-1)
        cols = np.tile(gdofs, (1, nl)).reshape(-1)
        n = op.n_nodes * C
        A = sp.coo_matrix(
            (np.asarray(emat, dtype=np.float64).reshape(-1), (rows, cols)),
            shape=(n, n),
        ).tocsr()
        # constraint rows/cols -> identity (Dirichlet-style condensation)
        ca = op.constraints_homogeneous
        mask = np.ones(n, dtype=bool)
        if ca.n:
            crows = np.asarray(ca.rows)
            mask[crows] = False
            D = sp.diags(mask.astype(np.float64))
            A = D @ A @ D + sp.diags((~mask).astype(np.float64))
        # entry layout for the device value refresh (_build_refresh)
        self._e_rows, self._e_cols, self._e_mask = rows, cols, mask

        dtype = op.dtype
        levels = []
        # hierarchy reuse: aggregates (and hence all shapes) are frozen at
        # the first initialize; later calls only refresh matrix values —
        # pytree structure stays stable, so downstream jits never recompile
        reuse = getattr(self, "_frozen_aggs", None)
        frozen_aggs = [] if reuse is None else reuse
        lvl_idx = 0
        for _ in range(self.max_levels):
            if reuse is None and A.shape[0] <= self.max_coarse * C:
                break
            if reuse is not None and lvl_idx >= len(reuse):
                break
            nn = A.shape[0] // C
            if reuse is None:
                # node-block strength graph: collapse components
                Ai = abs(A)
                comp_sum = None
                for c1 in range(C):
                    for c2 in range(C):
                        blk = Ai[c1::C, c2::C]
                        comp_sum = blk if comp_sum is None else comp_sum + blk
                agg_nodes, n_agg = _strength_aggregates(
                    comp_sum.tocsr(), self.theta
                )
                if n_agg > 0.7 * nn:
                    # coarsening stalled (typical for the pressure block of
                    # the NS saddle-point RAP: zero diagonal -> useless
                    # strength graph). Piling on barely-coarser levels
                    # densifies the Galerkin matrices catastrophically
                    # (observed: six ~1900-wide ELL levels = a 2.9 s
                    # V-cycle apply); stop here and let the dense LU take
                    # the current level instead.
                    break
                # P: dof (node, comp) -> (aggregate, comp)
                agg_dofs = (
                    np.repeat(agg_nodes, C) * C + np.tile(np.arange(C), nn)
                )
                frozen_aggs.append((agg_dofs, n_agg))
            else:
                agg_dofs, n_agg = reuse[lvl_idx]
            lvl_idx += 1
            P = sp.coo_matrix(
                (np.ones(A.shape[0]), (np.arange(A.shape[0]), agg_dofs)),
                shape=(A.shape[0], n_agg * C),
            ).tocsr()
            if self.matrix_free_fine and not levels:
                nA = A.shape[0]
                cols_e = jnp.zeros((nA, 0), jnp.int32)
                vals_e = jnp.zeros((nA, 0), dtype)
            else:
                cols_e, vals_e = _to_ell(A, dtype)
            diag = A.diagonal()
            inv_diag = np.where(np.abs(diag) > 1e-12, 1.0 / diag, 1.0)
            # Jacobi damping from a Gershgorin-ish bound
            row_sums = (
                np.asarray(np.abs(A).sum(axis=1)).ravel() * np.abs(inv_diag)
            )
            omega = 1.0 / max(row_sums.max(), 1.0)
            levels.append(
                AMGLevel(
                    ell_cols=cols_e,
                    ell_vals=vals_e,
                    inv_diag=jnp.asarray(inv_diag, dtype),
                    omega=jnp.asarray(omega, dtype),
                    agg=jnp.asarray(agg_dofs.astype(np.int32)),
                    ilu=(_ilu_factors(A, dtype)
                         if self.smoother == "ilu" else ()),
                )
            )
            A = (P.T @ A @ P).tocsr()

        # TPU's LuDecomposition HLO implements only F32
        lu_dt = (
            jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
        )
        lu = jax.scipy.linalg.lu_factor(jnp.asarray(A.todense(), lu_dt))
        self._args = AMGArgs(
            levels=tuple(levels), coarse_lu=tuple(lu),
            fine_args=(self.op.vmult_args if self.matrix_free_fine else ()),
        )
        self._n_levels = len(levels)
        self._frozen_aggs = frozen_aggs

        if self.smoother == "jacobi":
            # build the structure-frozen device refresh and immediately
            # rebuild the args from the canonical chain, so every later
            # initialize is ONE device dispatch (and all rebuilds share
            # one ELL pattern — no downstream retraces)
            self._build_refresh(self._e_rows, self._e_cols,
                                self._e_mask, n)
            self._device_refresh()

    # ------------------------------------------------------------------
    def _build_vcycle(self):
        n_smooth = self.n_smooth
        mf_fine = self.matrix_free_fine
        op = self.op
        C = self.n_comp
        use_ilu = self.smoother == "ilu"
        K = self.ilu_sweeps

        def spmv(lvl: AMGLevel, x):
            return jnp.einsum("rk,rk->r", lvl.ell_vals, x[lvl.ell_cols])

        def ilu_apply(f, r):
            """x ~= A^-1 r from the incomplete factors; the two triangular
            solves run as K fixed Jacobi-style sweeps each (iterative
            triangular solves — parallel on TPU, approximate like the
            reference's Ifpack ILU smoother is incomplete)."""
            l_cols, l_vals, u_cols, u_vals, udi, ipr, pc = f

            def tri_spmv(cols, vals, x):
                return jnp.einsum("rk,rk->r", vals, x[cols])

            rp = r[ipr]
            y = rp
            for _ in range(K):
                y = rp - tri_spmv(l_cols, l_vals, y)
            z = y * udi
            for _ in range(K):
                z = (y - tri_spmv(u_cols, u_vals, z)) * udi
            return z[pc]

        def vmult_fn(args: AMGArgs, src):
            shape = src.shape
            b0 = src.reshape(-1)

            def apply_lvl(k, x):
                if k == 0 and mf_fine:
                    return op.vmult_pure(
                        args.fine_args, x.reshape(-1, C)
                    ).reshape(-1)
                return spmv(args.levels[k], x)

            def smooth(k, x, b):
                lvl = args.levels[k]
                for _ in range(n_smooth):
                    r = b - apply_lvl(k, x)
                    if use_ilu and lvl.ilu:
                        x = x + ilu_apply(lvl.ilu, r)
                    else:
                        x = x + lvl.omega * lvl.inv_diag * r
                return x

            def down(k, b):
                lvl = args.levels[k]
                x = smooth(k, jnp.zeros_like(b), b)
                r = b - apply_lvl(k, x)
                n_next = (
                    args.levels[k + 1].inv_diag.shape[0]
                    if k + 1 < len(args.levels)
                    else args.n_coarse
                )
                rc = jnp.zeros(n_next, b.dtype).at[lvl.agg].add(r)
                if k + 1 < len(args.levels):
                    xc = down(k + 1, rc)
                else:
                    xc = jax.scipy.linalg.lu_solve(
                        args.coarse_lu, rc.astype(args.coarse_lu[0].dtype)
                    ).astype(b.dtype)
                x = x + xc[lvl.agg]
                return smooth(k, x, b)

            if args.levels:
                out = down(0, b0)
            else:
                out = jax.scipy.linalg.lu_solve(
                    args.coarse_lu, b0.astype(args.coarse_lu[0].dtype)
                ).astype(b0.dtype)
            return out.reshape(shape)

        self.vmult_pure = vmult_fn
        self._vmult = jax.jit(vmult_fn)

    @property
    def vmult_args(self) -> AMGArgs:
        if self._args is None:
            self.initialize()
        return self._args

    def vmult(self, x):
        return self._vmult(self.vmult_args, x)

    def print_stats(self):
        pass
