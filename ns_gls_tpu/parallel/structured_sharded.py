"""Node-sharded structured operator: z-slab partition + ppermute halo.

The scalable multi-chip path for structured patches — the TPU-native
re-design of the reference's partitioned vectors with ghost
update/compress (``operator_ns.cc:260,346,634-639``; ``main.cc:265-266``):

- the cell slabs (z layers in 3D, y rows in 2D) are partitioned into
  contiguous, equal blocks across a 1-D device mesh; each device stores
  ONLY its own node planes (interior residue classes of its slabs plus
  its class-0 planes, the top one shared/overlapping with the next
  device) — node storage is O(N / n_dev) per device, not replicated,
- the fused structured sweep (``ops/structured.py``) runs entirely
  locally per device: the overlapping class-0 plane IS the ghost layer,
  so the apply needs NO input communication,
- after the local sweep, exactly TWO ``lax.ppermute`` transfers of one
  (C, Yr, Nx) plane each combine the partial sums on the shared planes —
  per-apply collective volume is O(halo), independent of N (the
  reference's ``compress(add)``),
- masked dot products (ownership weight 1/2 on interior shared planes)
  give global norms with one scalar ``psum``.

Distributed vectors have layout (n_dev, C, m_pl, Yr, Nx), sharded on
axis 0, where m_pl = P*m + 1 local class-grouped planes for m local
slabs. ``scatter``/``gather_global`` convert to/from the global
class-grouped lattice layout (setup/IO only — the hot path never
materializes a global vector).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

AXIS = "z"


def _local_plane_index(P_deg: int, n_slabs: int, m: int, dev: int):
    """Global class-grouped plane indices owned by device `dev`
    (local layout: classes 1..P-1 of its m slabs, then m+1 class-0)."""
    s0 = dev * m
    idx = []
    for k in range(1, P_deg):
        base = (k - 1) * n_slabs
        idx.extend(range(base + s0, base + s0 + m))
    base = (P_deg - 1) * n_slabs
    idx.extend(range(base + s0, base + s0 + m + 1))
    return np.asarray(idx, np.int64)


class StructuredShardedOperator:
    """Halo-exchange apply for a structured-lattice NS operator.

    Wraps the operator's ``StructuredSweep`` tables; ``n_slabs`` must be
    divisible by the device count. The apply takes/returns distributed
    vectors; Dirichlet constraint handling stays with the caller (this is
    the raw cell-sweep component, like ``do_vmult_cell``).
    """

    def __init__(self, op, mesh: Mesh, interpret: bool | None = None):
        from ns_gls_tpu.ops.structured import (
            StructuredSweep,
            build_structured_tables,
        )

        tables = op._structured_tables
        if tables is None:
            tables = build_structured_tables(op)
        if tables is None:
            raise ValueError("operator/space is not structured-compatible")
        self.op = op
        self.mesh = mesh
        self.n_dev = int(mesh.devices.size)
        sw_full = op._ssweep or StructuredSweep(op, interpret=interpret)
        n_slabs = sw_full.n_slabs
        if n_slabs % self.n_dev:
            raise ValueError(
                f"{n_slabs} slabs not divisible by {self.n_dev} devices"
            )
        self.m = m = n_slabs // self.n_dev
        self.P = P_deg = sw_full.P
        self.C = sw_full.C
        self.Yr, self.Nx = sw_full.Yr, sw_full.Nx
        self.m_pl = P_deg * m + 1
        self.n_planes = P_deg * n_slabs + 1

        # the per-device sweep is just the structured sweep with m slabs
        class _LocalView:
            pass

        lv = _LocalView()
        lv.space = _LocalView()
        lv.space.dim = op.dim
        lv.space.degree = P_deg
        lv.space.n_q1d = sw_full.NQ
        cs = op.space.cell_shape
        lv.space.cell_shape = (
            (cs[0], cs[1], m) if op.dim == 3 else (cs[0], m)
        )
        lv.consider_time_derivative = op.consider_time_derivative
        lv.cell_wise_stabilization = op.cell_wise_stabilization
        lv.nu, lv.c_1, lv.c_2 = op.nu, op.c_1, op.c_2
        self.sweep = StructuredSweep(lv, interpret=interpret)

        # per-device table slices, stacked on a sharded leading axis
        def split(t):
            # (lead, n_slabs, R, L) -> (n_dev, lead, m, R, L)
            parts = [
                np.asarray(t)[:, d * m:(d + 1) * m] for d in range(self.n_dev)
            ]
            return jnp.asarray(np.stack(parts, axis=0))

        self._shard = NamedSharding(mesh, P(AXIS))
        self._repl = NamedSharding(mesh, P())
        self.tables = tables._replace(
            jinv=jax.device_put(split(tables.jinv), self._shard),
            jxw=jax.device_put(split(tables.jxw), self._shard),
            h=jax.device_put(split(tables.h), self._shard),
            band_S=jax.device_put(tables.band_S, self._repl),
            band_D=jax.device_put(tables.band_D, self._repl),
            band_Sy=jax.device_put(tables.band_Sy, self._repl),
            band_Dy=jax.device_put(tables.band_Dy, self._repl),
            S1=jax.device_put(tables.S1, self._repl),
            bdy=tuple(
                jax.device_put(b, self._repl) for b in tables.bdy
            ),
            D1=jax.device_put(tables.D1, self._repl),
        )
        self._gidx = np.stack(
            [
                _local_plane_index(P_deg, n_slabs, m, d)
                for d in range(self.n_dev)
            ],
            axis=0,
        )  # (n_dev, m_pl) global plane index per local plane

        # ownership weights for dot products: shared interior planes are
        # stored twice -> weight 1/2; the last device owns the final plane
        w = np.ones((self.n_dev, self.m_pl), np.float32)
        cls0 = (P_deg - 1) * m
        for d in range(self.n_dev):
            if d > 0:
                w[d, cls0] = 0.5
            if d < self.n_dev - 1:
                w[d, cls0 + m] = 0.5
        self.plane_weight = jax.device_put(
            jnp.asarray(w)[:, None, :, None, None], self._shard
        )

        from functools import partial

        # check_vma=False: the pallas out_shape inside carries no varying-
        # mesh-axes annotation (every output is per-shard anyway)
        smap = partial(jax.shard_map, mesh=mesh, check_vma=False)
        n_dev = self.n_dev
        sweep = self.sweep
        cls0_start = (P_deg - 1) * m

        fwd = [(i, i + 1) for i in range(n_dev - 1)]
        bwd = [(i + 1, i) for i in range(n_dev - 1)]

        def local_apply(flavor):
            def f(tabs, weight, stau, u, ul, vo):
                # block shapes (1, C, m_pl, Yr, Nx) etc.; squeeze the
                # device axis, run the local fused sweep, halo-combine
                loc_tabs = jax.tree_util.tree_map(
                    lambda t: t[0] if t.ndim >= 4 and t.shape[0] == 1 else t,
                    tabs,
                )
                r = sweep.apply(
                    loc_tabs, weight, stau, u[0], ul[0], vo[0], flavor
                )
                bot = r[:, cls0_start]
                top = r[:, cls0_start + m]
                from_up = jax.lax.ppermute(bot, AXIS, bwd)   # i+1 -> i
                from_dn = jax.lax.ppermute(top, AXIS, fwd)   # i -> i+1
                r = r.at[:, cls0_start + m].add(from_up)
                r = r.at[:, cls0_start].add(from_dn)
                return r[None]

            tab_specs = type(self.tables)(
                band_S=P(), band_D=P(), band_Sy=P(), band_Dy=P(),
                S1=P(), D1=P(),
                jinv=P(AXIS), jxw=P(AXIS), h=P(AXIS),
                bdy=tuple(P() for _ in self.tables.bdy),
            )
            return smap(
                f,
                in_specs=(tab_specs, P(), P(), P(AXIS), P(AXIS), P(AXIS)),
                out_specs=P(AXIS),
            )

        self._apply = {
            fl: jax.jit(local_apply(fl))
            for fl in ("fixed", "increment", "residual")
        }

        def dot(a, b):
            def f(a, b, w):
                s = jnp.sum(a * b * w)
                return jax.lax.psum(s, AXIS)[None]

            return smap(
                f, in_specs=(P(AXIS), P(AXIS), P(AXIS)), out_specs=P(AXIS)
            )(a, b, self.plane_weight)[0]

        self.dot = jax.jit(dot)

    # ------------------------------------------------------------------
    def scatter(self, uT):
        """Global (C, n_planes, Yr, Nx) -> distributed (n_dev, C, m_pl, ...)."""
        d = jnp.stack([uT[:, self._gidx[k]] for k in range(self.n_dev)])
        return jax.device_put(d, self._shard)

    def gather_global(self, dist):
        """Distributed -> global (C, n_planes, Yr, Nx); shared planes are
        identical on both owners after an apply, so first-writer wins."""
        out = jnp.zeros(
            (self.C, self.n_planes, self.Yr, self.Nx), jnp.float32
        )
        for k in range(self.n_dev):
            out = out.at[:, self._gidx[k]].set(dist[k])
        return out

    def apply(self, weight, stau, u_dist, ul_dist, vo_dist, flavor: str):
        return self._apply[flavor](
            self.tables, weight, stau, u_dist, ul_dist, vo_dist
        )
