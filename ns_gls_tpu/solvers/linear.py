"""Linear solvers: right-preconditioned restarted GMRES, Richardson, and a
dense direct solver — pure functional JAX, fully jit-compiled (lax loops,
static shapes).

The TPU re-design of the reference's solver layer (``solver_l.cc``):
- GMRES: restart basis 30, right preconditioning, Givens-rotation residual
  tracking, tolerance max(rtol*||b||, abs)  (``solver_l.cc:46-74``),
- Richardson (``solver_l.cc:97-120``),
- direct: dense LU of the assembled matrix — replaces Trilinos
  SolverDirect (``solver_l.cc:6-24``); used standalone on small problems
  and as the GMG coarse solver.

Operators/preconditioners enter as *pure functions* ``fn(args, x)`` plus a
dynamic ``args`` pytree, so jit caches stay valid while the linearization
state changes between Newton iterations / time steps (no stale closures).

All reductions are ``jnp`` dots — under pjit/shard_map they lower to
``psum`` over the device mesh (the MPI_Allreduce equivalents, SURVEY §2).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class SolveResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray  # total inner iterations
    residual: jnp.ndarray    # final (estimated) residual norm
    converged: jnp.ndarray


def _identity(args, x):
    return x


def acc_dot(a, b):
    """Dot product with f64 accumulation (when x64 is available) — the
    mixed-precision answer to ``config.h:6-7``'s f64 outer solve: on f32
    vectors with 1e6+ entries the f32 reduction noise is what corrupts
    Gram-Schmidt coefficients and convergence tests; accumulating in f64
    (emulated on TPU, ~O(N) VPU cost) restores f64-grade reductions while
    the vectors and the matvec stay f32.  Results are rounded back to the
    vector dtype so downstream arithmetic is unchanged."""
    if jax.config.jax_enable_x64 and a.dtype == jnp.float32:
        return jnp.vdot(
            a.astype(jnp.float64), b.astype(jnp.float64)
        ).astype(a.dtype)
    return jnp.vdot(a, b)


def acc_norm(a):
    """2-norm via :func:`acc_dot` (f64-accumulated sum of squares)."""
    if jax.config.jax_enable_x64 and a.dtype == jnp.float32:
        a64 = a.reshape(-1).astype(jnp.float64)
        return jnp.sqrt(jnp.vdot(a64, a64)).astype(a.dtype)
    return jnp.linalg.norm(a.reshape(-1))


@functools.partial(
    jax.jit, static_argnames=("A", "M", "restart", "max_restarts")
)
def gmres(
    A: Callable,
    a_args,
    b: jnp.ndarray,
    x0: jnp.ndarray,
    M: Callable = _identity,
    m_args=(),
    tol: float | jnp.ndarray = 1e-12,
    restart: int = 30,
    max_restarts: int = 100,
) -> SolveResult:
    """Right-preconditioned GMRES(restart): solves A x = b via x = M z.

    `A(a_args, v)`, `M(m_args, v)`: linear maps on arrays shaped like `b`.
    `tol`: absolute residual tolerance.
    """
    shape = b.shape
    dtype = b.dtype
    n = b.size
    m = restart

    def mv(v):
        return A(a_args, v.reshape(shape)).reshape(-1)

    def pc(v):
        return M(m_args, v.reshape(shape)).reshape(-1)

    bf = b.reshape(-1)
    tol = jnp.asarray(tol, dtype)

    def cycle(carry):
        # each cycle starts from the TRUE residual (recomputed in working
        # precision), so convergence is gated on truth even when the
        # preconditioner is noisy (e.g. the f32 MG V-cycle) and the Givens
        # recursion under-estimates; a stagnation guard stops restarts that
        # no longer reduce the true residual.
        x, V, total_it, prev_beta, _ = carry
        r = bf - mv(x)
        beta = acc_norm(r)

        # V rides the outer carry: rows are always written before read
        # (bounded by this cycle's j), so no per-cycle re-zeroing of the
        # (m+1, n) basis
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)
        V = V.at[0].set(jnp.where(beta > 0, r / beta, 0.0))

        def arnoldi_step(carry):
            V, H, cs, sn, g, j, _ = carry
            w = mv(pc(V[j]))

            # modified Gram-Schmidt over k <= j (dynamic trip count: the
            # static-bound variant read all m+1 basis rows every step —
            # ~3x the Krylov memory traffic at typical iteration counts)
            def mgs(k, wh):
                w, hcol = wh
                hk = acc_dot(V[k], w)
                return (w - hk * V[k], hcol.at[k].set(hk))

            w, hcol = jax.lax.fori_loop(
                0, j + 1, mgs, (w, jnp.zeros(m + 1, dtype))
            )
            hj1 = acc_norm(w)
            V = V.at[j + 1].set(jnp.where(hj1 > 0, w / hj1, 0.0))
            hcol = hcol.at[j + 1].set(hj1)

            # previous Givens rotations on entries 0..j (scalar work)
            def rot(k, hc):
                t0 = cs[k] * hc[k] + sn[k] * hc[k + 1]
                t1 = -sn[k] * hc[k] + cs[k] * hc[k + 1]
                hc = hc.at[k].set(t0)
                return hc.at[k + 1].set(t1)

            hcol = jax.lax.fori_loop(0, j, rot, hcol)

            # new rotation eliminating hcol[j+1]
            denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
            c_new = jnp.where(denom > 0, hcol[j] / denom, 1.0)
            s_new = jnp.where(denom > 0, hcol[j + 1] / denom, 0.0)
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            hcol = hcol.at[j].set(c_new * hcol[j] + s_new * hcol[j + 1])
            hcol = hcol.at[j + 1].set(0.0)
            g_j1 = -s_new * g[j]
            g = g.at[j + 1].set(g_j1).at[j].set(c_new * g[j])

            H = H.at[:, j].set(hcol)
            return (V, H, cs, sn, g, j + 1, jnp.abs(g_j1))

        def arnoldi_cond(carry):
            *_, j, res = carry
            return (j < m) & (res > tol)

        V, H, cs, sn, g, j_final, res = jax.lax.while_loop(
            arnoldi_cond,
            arnoldi_step,
            (V, H, cs, sn, g, jnp.array(0), beta),
        )

        # back-substitute the masked upper-triangular system
        mask = jnp.arange(m) < j_final
        Hm = H[:m, :] * mask[None, :] * mask[:, None] + jnp.diag(
            jnp.where(mask, 0.0, 1.0)
        )
        y = jax.scipy.linalg.solve_triangular(Hm, jnp.where(mask, g[:m], 0.0))
        ym = jnp.where(mask, y, 0.0)
        # dynamic-bound accumulation: only the j_final basis rows that
        # carry weight are read (the masked einsum read all m rows)
        z = jax.lax.fori_loop(
            0, j_final,
            lambda i, acc: acc + ym[i] * V[i],
            jnp.zeros(n, dtype),
        )
        dx = pc(z)

        converged = beta <= tol
        stagnated = (beta > 0.999 * prev_beta) & (total_it > 0)
        return (x + dx, V, total_it + j_final, beta, converged | stagnated)

    def outer_cond(carry):
        _, _, total_it, _, done = carry
        return (~done) & (total_it < m * max_restarts)

    x0f = x0.reshape(-1)
    inf = jnp.asarray(jnp.inf, dtype)
    V0 = jnp.zeros((m + 1, n), dtype)
    x, _, it, _, _ = jax.lax.while_loop(
        outer_cond, cycle, (x0f, V0, jnp.array(0), inf, jnp.array(False))
    )
    # final true residual for honest reporting
    res_final = acc_norm(bf - mv(x))
    return SolveResult(x.reshape(shape), it, res_final, res_final <= tol)


@functools.partial(
    jax.jit, static_argnames=("A", "M", "restart", "n_cycles")
)
def gmres_fixed(
    A: Callable,
    a_args,
    b: jnp.ndarray,
    x0: jnp.ndarray,
    M: Callable = _identity,
    m_args=(),
    tol: float | jnp.ndarray = 1e-12,
    restart: int = 30,
    n_cycles: int = 1,
) -> SolveResult:
    """Statically-bounded GMRES: same math as :func:`gmres`, but every
    loop is a ``fori_loop`` — no data-dependent ``while_loop`` anywhere.
    Iterations past convergence are masked no-ops (a converged state is a
    fixed point of the cycle), so the result matches `gmres` up to the
    iteration cap ``restart * n_cycles``.

    Exists for nesting inside other jitted loops: a while-loop GMRES
    inside the V-cycle inside the outer while-loop GMRES deterministically
    crashes the TPU worker (PERF.md "Full-solver runs"); this variant is
    the TPU-safe coarse solver for ``gmg coarse grid iterate: true``
    (``multigrid.cc:490-532``)."""
    shape = b.shape
    dtype = b.dtype
    n = b.size
    m = restart

    def mv(v):
        return A(a_args, v.reshape(shape)).reshape(-1)

    def pc(v):
        return M(m_args, v.reshape(shape)).reshape(-1)

    bf = b.reshape(-1)
    tol = jnp.asarray(tol, dtype)

    def cycle(_, carry):
        x, total_it = carry
        r = bf - mv(x)
        beta = acc_norm(r)

        V = jnp.zeros((m + 1, n), dtype)
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)
        V = V.at[0].set(jnp.where(beta > 0, r / beta, 0.0))

        def arnoldi_step(j, carry):
            V, H, cs, sn, g, jf, res = carry
            active = res > tol
            w = mv(pc(V[j]))

            def mgs(k, wh):
                w, hcol = wh
                hk = jnp.where(k <= j, acc_dot(V[k], w), 0.0)
                return (w - hk * V[k], hcol.at[k].set(hk))

            w, hcol = jax.lax.fori_loop(
                0, m + 1, mgs, (w, jnp.zeros(m + 1, dtype))
            )
            hj1 = acc_norm(w)
            V = V.at[j + 1].set(
                jnp.where(active & (hj1 > 0), w / jnp.maximum(hj1, 1e-300),
                          V[j + 1])
            )
            hcol = hcol.at[j + 1].set(hj1)

            def rot(k, hc):
                t0 = cs[k] * hc[k] + sn[k] * hc[k + 1]
                t1 = -sn[k] * hc[k] + cs[k] * hc[k + 1]
                apply = k < j
                hc = hc.at[k].set(jnp.where(apply, t0, hc[k]))
                return hc.at[k + 1].set(jnp.where(apply, t1, hc[k + 1]))

            hcol = jax.lax.fori_loop(0, m, rot, hcol)

            denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
            c_new = jnp.where(denom > 0, hcol[j] / denom, 1.0)
            s_new = jnp.where(denom > 0, hcol[j + 1] / denom, 0.0)
            cs = cs.at[j].set(jnp.where(active, c_new, cs[j]))
            sn = sn.at[j].set(jnp.where(active, s_new, sn[j]))
            hcol = hcol.at[j].set(c_new * hcol[j] + s_new * hcol[j + 1])
            hcol = hcol.at[j + 1].set(0.0)
            g_j1 = -s_new * g[j]
            g_new = g.at[j + 1].set(g_j1).at[j].set(c_new * g[j])
            g = jnp.where(active, g_new, g)

            H = H.at[:, j].set(jnp.where(active, hcol, H[:, j]))
            jf = jf + active.astype(jf.dtype)
            res = jnp.where(active, jnp.abs(g_j1), res)
            return (V, H, cs, sn, g, jf, res)

        V, H, cs, sn, g, j_final, _ = jax.lax.fori_loop(
            0, m, arnoldi_step,
            (V, H, cs, sn, g, jnp.array(0), beta),
        )

        mask = jnp.arange(m) < j_final
        Hm = H[:m, :] * mask[None, :] * mask[:, None] + jnp.diag(
            jnp.where(mask, 0.0, 1.0)
        )
        y = jax.scipy.linalg.solve_triangular(Hm, jnp.where(mask, g[:m], 0.0))
        dx = pc(jnp.einsum("i,in->n", jnp.where(mask, y, 0.0), V[:m]))
        return (x + dx, total_it + j_final)

    x, it = jax.lax.fori_loop(
        0, n_cycles, cycle, (x0.reshape(-1), jnp.array(0))
    )
    res_final = acc_norm(bf - mv(x))
    return SolveResult(x.reshape(shape), it, res_final, res_final <= tol)


@functools.partial(jax.jit, static_argnames=("A", "M", "max_iter"))
def richardson(
    A: Callable,
    a_args,
    b: jnp.ndarray,
    x0: jnp.ndarray,
    M: Callable = _identity,
    m_args=(),
    tol: float | jnp.ndarray = 1e-12,
    max_iter: int = 1000,
) -> SolveResult:
    """Preconditioned Richardson: x += M (b - A x)  (``solver_l.cc:97-120``)."""
    tol = jnp.asarray(tol, b.dtype)

    def cond(carry):
        _, it, res = carry
        return (res > tol) & (it < max_iter)

    def body(carry):
        x, it, _ = carry
        r = b - A(a_args, x)
        x = x + M(m_args, r)
        return (x, it + 1, jnp.linalg.norm(r.reshape(-1)))

    r0 = jnp.linalg.norm((b - A(a_args, x0)).reshape(-1))
    x, it, res = jax.lax.while_loop(cond, body, (x0, jnp.array(0), r0))
    return SolveResult(x, it, res, res <= tol)


# --------------------------------------------------------------------------
# object layer (reference ``solver_l.h:17-27`` contract)
# --------------------------------------------------------------------------
class LinearSolverBase:
    def initialize(self):
        pass

    def solve(self, b):
        raise NotImplementedError

    @property
    def last_iterations(self) -> int:
        return getattr(self, "_last_it", 0)


class LinearSolverGMRES(LinearSolverBase):
    def __init__(self, op, preconditioner, n_max_iterations=10000,
                 absolute_tolerance=1e-12, relative_tolerance=1e-8,
                 restart=30, logger=None):
        self.op = op
        self.preconditioner = preconditioner
        self.n_max_iterations = n_max_iterations
        self.abs_tol = absolute_tolerance
        self.rel_tol = relative_tolerance
        self.restart = restart
        self.logger = logger

    def solve(self, b):
        tol = jnp.maximum(
            self.rel_tol * jnp.linalg.norm(b.reshape(-1)), self.abs_tol
        )
        op = self.op
        if hasattr(op, "to_dist"):
            # halo-sharded operator: run the Krylov loop on distributed
            # (n_dev, n_own_max, C) vectors — every operator apply is
            # O(halo); the (replicated-layout) preconditioner converts at
            # its boundary (``update_ghost_values`` only where needed)
            bd = op.to_dist(b)
            pre = self.preconditioner

            if getattr(pre, "distributed", False):
                # distributed V-cycle: same (n_dev, n_own_max, C) layout
                # end to end — no O(N) conversion inside the Krylov loop
                M = pre.vmult_pure
            else:
                def M(margs, x):
                    return op.to_dist(
                        pre.vmult_pure(margs, op.to_global(x))
                    )

            res = gmres(
                op.vmult_pure, op.vmult_args, bd, jnp.zeros_like(bd),
                M=M, m_args=pre.vmult_args, tol=tol,
                restart=self.restart,
                max_restarts=max(1, self.n_max_iterations // self.restart),
            )
            x = op.to_global(res.x)
        else:
            res = gmres(
                op.vmult_pure,
                op.vmult_args,
                b,
                jnp.zeros_like(b),
                M=self.preconditioner.vmult_pure,
                m_args=self.preconditioner.vmult_args,
                tol=tol,
                restart=self.restart,
                max_restarts=max(1, self.n_max_iterations // self.restart),
            )
            x = res.x
        self._last_it = int(res.iterations)
        if self.logger:
            self.logger(f"    [L] solved in {self._last_it} iterations.")
        return x


class LinearSolverRichardson(LinearSolverBase):
    def __init__(self, op, preconditioner, n_max_iterations=10000,
                 absolute_tolerance=1e-12, relative_tolerance=1e-8,
                 logger=None):
        self.op = op
        self.preconditioner = preconditioner
        self.n_max_iterations = n_max_iterations
        self.abs_tol = absolute_tolerance
        self.rel_tol = relative_tolerance
        self.logger = logger

    def solve(self, b):
        tol = jnp.maximum(
            self.rel_tol * jnp.linalg.norm(b.reshape(-1)), self.abs_tol
        )
        res = richardson(
            self.op.vmult_pure, self.op.vmult_args, b, jnp.zeros_like(b),
            M=self.preconditioner.vmult_pure,
            m_args=self.preconditioner.vmult_args,
            tol=tol, max_iter=self.n_max_iterations,
        )
        self._last_it = int(res.iterations)
        if self.logger:
            self.logger(f"    [L] solved in {self._last_it} iterations.")
        return res.x


class LinearSolverDirect(LinearSolverBase):
    """Dense LU of the assembled (constrained) system — replaces the
    Trilinos sparse direct solver for the small problems it is used on
    (coarse grids, the 'direct' configs)."""

    def __init__(self, op, logger=None):
        self.op = op
        self.logger = logger
        self._lu = None

    def initialize(self):
        from ns_gls_tpu.ops.assembly import assemble_dense

        n = self.op.n_nodes * self.op.n_comp
        if n > 40000:
            raise ValueError(
                f"dense direct solver requested for {n} dofs; use GMRES with"
                " GMG/AMG instead (the Trilinos sparse-direct equivalent is"
                " only provided for small/coarse problems)"
            )
        A = assemble_dense(self.op)
        # TPU's LuDecomposition HLO implements only F32
        lu_dt = (
            self.op.dtype if jax.default_backend() == "cpu" else jnp.float32
        )
        self._lu = jax.scipy.linalg.lu_factor(jnp.asarray(A, lu_dt))

    def solve(self, b):
        if self._lu is None:
            self.initialize()
        x = jax.scipy.linalg.lu_solve(
            self._lu, b.reshape(-1).astype(self._lu[0].dtype)
        ).astype(b.dtype)
        self._last_it = 1
        return x.reshape(b.shape)
