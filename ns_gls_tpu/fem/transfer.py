"""Two-level MG transfers between nested uniformly-refined FE spaces.

TPU-native equivalent of deal.II ``MGTwoLevelTransfer`` +
``MGTransferGlobalCoarsening`` (reference ``main.cc:540-567``): transfers
are precomputed sparse gather maps —

- prolongation P: fine node <- one coarse cell's nodes with the embedding
  weights (coarse basis evaluated at the fine support point),
- restriction = Pᵀ (scatter-add),
- solution interpolation fine -> coarse ("interpolate_to_mg",
  ``main.cc:789-795``): coarse node <- fine basis evaluated at the coarse
  support point (NOT Pᵀ).

Both are single gathers / scatter-adds on device — no halo logic needed
(node arrays are replicated; under sharding these become psum-style
collectives).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ns_gls_tpu.fem.element import embedding_matrix, tabulate_at
from ns_gls_tpu.fem.space import FESpace


class TwoLevelTransfer(NamedTuple):
    # prolongation: fine node <- coarse nodes
    p_cols: jnp.ndarray   # (n_fine_nodes, n_loc) int32
    p_wts: jnp.ndarray    # (n_fine_nodes, n_loc)
    # injection/interpolation: coarse node <- fine nodes
    i_cols: jnp.ndarray   # (n_coarse_nodes, n_loc) int32
    i_wts: jnp.ndarray    # (n_coarse_nodes, n_loc)

    # shapes are static (not pytree leaves) so they stay concrete under jit
    @property
    def n_coarse(self) -> int:
        return self.i_cols.shape[0]

    @property
    def n_fine(self) -> int:
        return self.p_cols.shape[0]


def build_transfer(coarse: FESpace, fine: FESpace, dtype=jnp.float32
                   ) -> TwoLevelTransfer:
    """fine.mesh must be coarse.mesh.refine(flags) — uniform or adaptive.
    Uses fine.mesh.parent_cell/parent_child: refined parents transfer via
    the embedding, carried cells via identity."""
    dim = coarse.dim
    deg = coarse.degree
    n_children = 2**dim

    emb = embedding_matrix(deg, dim)  # (2^d, n_loc, n_loc)
    n_loc = emb.shape[1]
    eye = np.eye(n_loc)

    cn_c = coarse.cell_nodes  # (n_cc, n_loc)
    cn_f = fine.cell_nodes

    pc = fine.mesh.parent_child
    pp = fine.mesh.parent_cell
    if pc is None:  # uniform refinement without maps
        assert fine.mesh.n_cells == coarse.mesh.n_cells * n_children
        pp = np.repeat(np.arange(coarse.mesh.n_cells), n_children)
        pc = np.tile(np.arange(n_children), coarse.mesh.n_cells)

    # ---- prolongation map -------------------------------------------------
    p_cols = np.zeros((fine.n_nodes, n_loc), dtype=np.int32)
    p_wts = np.zeros((fine.n_nodes, n_loc), dtype=np.float64)
    for child in range(-1, n_children):
        sel = np.nonzero(pc == child)[0]
        if len(sel) == 0:
            continue
        rows = cn_f[sel]                # (n_sel, n_loc) fine nodes
        parents = cn_c[pp[sel]]         # (n_sel, n_loc) coarse nodes
        for i in range(n_loc):
            p_cols[rows[:, i]] = parents
            p_wts[rows[:, i]] = eye[i] if child < 0 else emb[child, i]

    # ---- injection map ----------------------------------------------------
    # coarse support point p lives in child c(p); fine local coords 2p-off
    sp = coarse.element.support_points  # (n_loc, dim)
    child_of = np.zeros(n_loc, dtype=np.int64)
    w_inj = np.zeros((n_loc, n_loc))
    for i in range(n_loc):
        p = sp[i]
        off = (p > 0.5).astype(np.float64)
        child_of[i] = int(sum(int(off[d]) << d for d in range(dim)))
        q = 2.0 * p - off
        S, _ = tabulate_at(deg, dim, q[None, :])
        w_inj[i] = S[0]

    # fine cell of (parent, child); -1 where the parent was carried
    fine_of = np.full((coarse.mesh.n_cells, n_children), -1, dtype=np.int64)
    refined = pc >= 0
    fine_of[pp[refined], pc[refined]] = np.nonzero(refined)[0]
    carried_fine = np.full(coarse.mesh.n_cells, -1, dtype=np.int64)
    carried_fine[pp[~refined]] = np.nonzero(~refined)[0]

    i_cols = np.zeros((coarse.n_nodes, n_loc), dtype=np.int32)
    i_wts = np.zeros((coarse.n_nodes, n_loc), dtype=np.float64)
    for i in range(n_loc):
        # refined parents: interpolate from the owning child
        sel = np.nonzero(fine_of[:, child_of[i]] >= 0)[0]
        if len(sel):
            fcells = fine_of[sel, child_of[i]]
            i_cols[cn_c[sel, i]] = cn_f[fcells]
            i_wts[cn_c[sel, i]] = w_inj[i]
        # carried parents: identity from the same cell
        sel = np.nonzero(carried_fine >= 0)[0]
        if len(sel):
            fcells = carried_fine[sel]
            i_cols[cn_c[sel, i]] = cn_f[fcells]
            i_wts[cn_c[sel, i]] = eye[i]

    return TwoLevelTransfer(
        p_cols=jnp.asarray(p_cols),
        p_wts=jnp.asarray(p_wts, dtype),
        i_cols=jnp.asarray(i_cols),
        i_wts=jnp.asarray(i_wts, dtype),
    )


def _row_gather_sum(cols, wts, u):
    """sum_k w[:, k] * u[cols[:, k], :], one ROW gather per local basis
    function — every intermediate stays 2-D with the compact (rows, C)
    layout.  The one-shot (rows, n_loc, C) gather/product gets a
    T(8,128)-tiled layout on TPU (minor 4 -> 128, second-minor 27 -> 32),
    a 27 GB intermediate at Turek-3D ref 3 — the layout trap that OOMed
    the BASELINE config."""
    n_loc = cols.shape[1]
    acc = u[cols[:, 0]] * wts[:, 0:1].astype(u.dtype)
    for k in range(1, n_loc):
        acc = acc + u[cols[:, k]] * wts[:, k: k + 1].astype(u.dtype)
    return acc


# module-level jits: when called eagerly (the driver's per-step history/
# linearization interpolation chains, ``main.cc:772-803``) the n_loc-term
# loops otherwise dispatch ~3*n_loc SEPARATE device ops per call — ~80
# eager dispatches per 3D-Q2 transfer, each paying the ~29 ms tunnel
# dispatch latency on TPU. Inside an outer jit (the V-cycle) they simply
# inline. One compile per level shape.
@jax.jit
def prolongate(t: TwoLevelTransfer, u_c: jnp.ndarray) -> jnp.ndarray:
    """(n_coarse, C) -> (n_fine, C)."""
    return _row_gather_sum(t.p_cols, t.p_wts, u_c)


@jax.jit
def restrict(t: TwoLevelTransfer, r_f: jnp.ndarray) -> jnp.ndarray:
    """Pᵀ: (n_fine, C) -> (n_coarse, C) — one row scatter-add per local
    basis function (2-D compact layouts, see :func:`_row_gather_sum`)."""
    out = jnp.zeros((t.n_coarse, r_f.shape[1]), r_f.dtype)
    for k in range(t.p_cols.shape[1]):
        out = out.at[t.p_cols[:, k]].add(
            r_f * t.p_wts[:, k: k + 1].astype(r_f.dtype)
        )
    return out


@jax.jit
def interpolate_to_coarse(t: TwoLevelTransfer, u_f: jnp.ndarray) -> jnp.ndarray:
    """Solution interpolation (pointwise), fine -> coarse."""
    return _row_gather_sum(t.i_cols, t.i_wts, u_f).astype(u_f.dtype)
