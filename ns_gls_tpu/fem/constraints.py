"""Affine constraints: u_i = sum_j w_ij u_j + b_i  (host build, device apply).

TPU-native equivalent of deal.II ``AffineConstraints`` as the reference
uses it (``main.cc:258-310``): homogeneous Dirichlet, pressure pinning,
no-normal-flux (slip), periodicity, hanging nodes, and time-dependent
inhomogeneous Dirichlet values.  The closed form is a set of padded device
arrays; ``distribute`` / ``set_zero`` / the C/Cᵀ sandwich used inside the
matrix-free operator are pure jittable array ops.

DoF convention: scalar dof = node * n_comp + comp, on vectors stored as
(n_nodes, n_comp).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ConstraintArrays(NamedTuple):
    """Closed constraints in device form (a pytree)."""

    rows: jnp.ndarray      # (n_cstr,) int32 flattened dof ids
    cols: jnp.ndarray      # (n_cstr, max_deps) int32 (pad: 0)
    weights: jnp.ndarray   # (n_cstr, max_deps) (pad: 0)
    inhom: jnp.ndarray     # (n_cstr,)

    @property
    def n(self) -> int:
        return self.rows.shape[0]


class AffineConstraints:
    """Host-side builder.  First-added line for a dof wins (callers add in
    the reference's precedence order, ``main.cc:273-293``)."""

    def __init__(self, n_nodes: int, n_comp: int):
        self.n_nodes = n_nodes
        self.n_comp = n_comp
        # dof -> (list[(col_dof, weight)], inhomogeneity)
        self.lines: dict[int, tuple[list, float]] = {}

    def dof(self, node: int, comp: int) -> int:
        return int(node) * self.n_comp + int(comp)

    def add_line(self, dof: int, entries=(), inhom: float = 0.0) -> None:
        if dof not in self.lines:
            self.lines[dof] = (list(entries), float(inhom))

    def is_constrained(self, dof: int) -> bool:
        return dof in self.lines

    # ---- high-level builders ------------------------------------------
    def add_dirichlet(self, nodes, comps, values=None) -> None:
        """Constrain components `comps` at `nodes` to fixed values.
        `values`: None (zero), or (n_nodes_sel, n_comps_sel) array."""
        nodes = np.atleast_1d(nodes)
        comps = list(np.atleast_1d(comps))
        for a, node in enumerate(nodes):
            for b, comp in enumerate(comps):
                v = 0.0 if values is None else float(values[a][b])
                self.add_line(self.dof(node, comp), (), v)

    def add_periodic(self, nodes_a, nodes_b, comps) -> None:
        """u(node_a) = u(node_b) for each pair, per component."""
        for na, nb in zip(np.atleast_1d(nodes_a), np.atleast_1d(nodes_b)):
            for comp in np.atleast_1d(comps):
                self.add_line(
                    self.dof(na, comp), [(self.dof(nb, comp), 1.0)], 0.0
                )

    def add_no_normal_flux(self, nodes, normals) -> None:
        """Slip: n·u = 0 at each node; constrains the largest-|n| component
        (deal.II ``compute_no_normal_flux_constraints``)."""
        for node, n in zip(np.atleast_1d(nodes), np.atleast_2d(normals)):
            dmax = int(np.argmax(np.abs(n)))
            if abs(n[dmax]) < 1e-14:
                continue
            entries = [
                (self.dof(node, d), -float(n[d] / n[dmax]))
                for d in range(len(n))
                if d != dmax and abs(n[d]) > 1e-14
            ]
            self.add_line(self.dof(node, dmax), entries, 0.0)

    def add_hanging_node(self, node, comp_all, master_nodes, weights) -> None:
        """u(node) = sum_k weights[k] * u(master_nodes[k]) per component."""
        for comp in range(self.n_comp):
            self.add_line(
                self.dof(node, comp),
                [(self.dof(m, comp), float(w)) for m, w in zip(master_nodes, weights)],
                0.0,
            )

    # ---- closing --------------------------------------------------------
    def close(self, dtype=jnp.float64) -> ConstraintArrays:
        """Resolve constraint chains and emit padded device arrays."""
        resolved: dict[int, tuple[list, float]] = {}

        def resolve(dof, depth=0):
            if depth > 16:
                raise ValueError("constraint chain too deep / cyclic")
            if dof in resolved:
                return resolved[dof]
            entries, inhom = self.lines[dof]
            out: dict[int, float] = {}
            acc_inhom = inhom
            for col, w in entries:
                if col in self.lines:
                    sub_entries, sub_inhom = resolve(col, depth + 1)
                    acc_inhom += w * sub_inhom
                    for c2, w2 in sub_entries:
                        out[c2] = out.get(c2, 0.0) + w * w2
                else:
                    out[col] = out.get(col, 0.0) + w
            res = (sorted(out.items()), acc_inhom)
            resolved[dof] = res
            return res

        for dof in self.lines:
            resolve(dof)

        rows = sorted(resolved.keys())
        max_deps = max((len(resolved[r][0]) for r in rows), default=0)
        max_deps = max(max_deps, 1)
        n = len(rows)
        cols = np.zeros((n, max_deps), dtype=np.int32)
        wts = np.zeros((n, max_deps), dtype=np.float64)
        inh = np.zeros(n, dtype=np.float64)
        for i, r in enumerate(rows):
            entries, b = resolved[r]
            inh[i] = b
            for k, (c, w) in enumerate(entries):
                cols[i, k] = c
                wts[i, k] = w
        return ConstraintArrays(
            rows=jnp.asarray(np.array(rows, dtype=np.int32)),
            cols=jnp.asarray(cols),
            weights=jnp.asarray(wts.astype(np.float64), dtype=dtype),
            inhom=jnp.asarray(inh.astype(np.float64), dtype=dtype),
        )


# --------------------------------------------------------------------------
# device-side application (pure functions of ConstraintArrays; module-level
# jits — called eagerly from the driver's per-step flow, each would
# otherwise dispatch 3-5 separate device ops per call, ~29 ms each on the
# tunneled TPU; inside outer jits they simply inline)
# --------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("homogeneous",))
def distribute(ca: ConstraintArrays, u: jnp.ndarray,
               homogeneous: bool = False) -> jnp.ndarray:
    """u[rows] = sum w * u[cols] (+ inhom).  u: (n_nodes, n_comp)."""
    if ca.n == 0:
        return u
    shape = u.shape
    uf = u.reshape(-1)
    vals = (uf[ca.cols] * ca.weights).sum(axis=1)
    if not homogeneous:
        vals = vals + ca.inhom
    # weights/inhom may be wider (f64) than u (f32): scatter operands
    # must match dtypes (a FutureWarning today, an error in future JAX)
    return uf.at[ca.rows].set(vals.astype(uf.dtype)).reshape(shape)


@jax.jit
def set_zero(ca: ConstraintArrays, u: jnp.ndarray) -> jnp.ndarray:
    if ca.n == 0:
        return u
    shape = u.shape
    return u.reshape(-1).at[ca.rows].set(0.0).reshape(shape)


@jax.jit
def condense_transpose(ca: ConstraintArrays, r: jnp.ndarray) -> jnp.ndarray:
    """r <- Cᵀ r: move contributions of constrained rows onto their
    dependency columns, then zero the constrained rows (the write-side half
    of the matrix-free constraint sandwich dst = Cᵀ A C src)."""
    if ca.n == 0:
        return r
    shape = r.shape
    rf = r.reshape(-1)
    vals = rf[ca.rows]
    rf = rf.at[ca.cols.reshape(-1)].add(
        (ca.weights * vals[:, None]).reshape(-1).astype(rf.dtype)
    )
    rf = rf.at[ca.rows].set(0.0)
    return rf.reshape(shape)


@jax.jit
def copy_constrained(ca: ConstraintArrays, dst: jnp.ndarray,
                     src: jnp.ndarray) -> jnp.ndarray:
    """dst[rows] = src[rows] (reference ``operator_ns.cc:719-721``)."""
    if ca.n == 0:
        return dst
    shape = dst.shape
    df = dst.reshape(-1)
    return df.at[ca.rows].set(src.reshape(-1)[ca.rows]).reshape(shape)
