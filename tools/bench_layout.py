"""Micro-bench: (N, C) vs flat (C*N,) solver-vector layouts on TPU.

The TPU (8,128) tiling pads the minor C=4 axis of (N, 4) f32 arrays 32x,
so every elementwise pass over solver vectors (axpys, Jacobi scaling,
Givens updates) pays ~7x the bandwidth of a flat layout (round-2
measurement, see memory/PERF.md). This tool quantifies, on the chip:

  1. elementwise axpy cost per layout,
  2. dot-product cost per layout,
  3. the relayout (reshape) cost at the operator boundary,

to decide whether flattening the Krylov stack (reshaping only around
op.vmult) is a net win. Honest timing: chained ops in one jit, fetch a
scalar (block_until_ready does not wait under the tunneled runtime).

Usage: python tools/bench_layout.py [n_nodes] [reps]
"""

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_100_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    C = 4

    rng = np.random.default_rng(0)
    a2 = jnp.asarray(rng.standard_normal((n, C)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((n, C)), jnp.float32)
    a1 = a2.reshape(-1)
    b1 = b2.reshape(-1)

    def chain(f, x, y):
        def run(x, y):
            acc = jnp.float32(0.0)
            for i in range(reps):
                x = f(x, y, jnp.float32(1e-6 * (i + 1)))
            return x, (x.reshape(-1)[:1]).sum()

        return jax.jit(run)

    axpy = lambda x, y, s: x + s * y

    def timeit(fn, x, y):
        (r, tok), _ = fn(x, y), None
        float(tok)  # warmup + fetch
        t0 = time.time()
        r, tok = fn(x, y)
        float(tok)
        return (time.time() - t0) / reps * 1e6  # us/op

    t2 = timeit(chain(axpy, a2, b2), a2, b2)
    t1 = timeit(chain(axpy, a1, b1), a1, b1)

    # dots — the accumulator feeds back into the operand so XLA cannot
    # CSE the reps iterations into a single reduction. Each iteration
    # therefore costs one elementwise perturbation + one dot; subtract
    # the axpy lane to isolate the dot, the layout RATIO is what matters
    def dots(x, y):
        def run(x, y):
            acc = jnp.float32(0.0)
            for i in range(reps):
                acc = jnp.vdot(x + acc * jnp.float32(1e-30), y) * (
                    jnp.float32(1e-9)
                )
            return acc

        return jax.jit(run)

    def timeit_s(fn, x, y):
        float(fn(x, y))
        t0 = time.time()
        float(fn(x, y))
        return (time.time() - t0) / reps * 1e6

    d2 = timeit_s(dots(a2, b2), a2, b2)
    d1 = timeit_s(dots(a1, b1), a1, b1)

    # relayout cost (N, C) -> (C*N,) -> (N, C) round trip
    def relay(x, y):
        def run(x, y):
            acc = jnp.float32(0.0)
            for i in range(reps):
                f = x.reshape(-1) + jnp.float32(1e-7 * i)
                x = f.reshape(n, C)
            return x, x[0, 0]

        return jax.jit(run)

    r2 = timeit(relay(a2, b2), a2, b2)

    out = {
        "metric": "layout_axpy_us",
        "n_nodes": n,
        "axpy_NC_us": round(t2, 2),
        "axpy_flat_us": round(t1, 2),
        "ratio_axpy": round(t2 / t1, 2),
        "dot_NC_us": round(d2, 2),
        "dot_flat_us": round(d1, 2),
        "relayout_roundtrip_us": round(r2, 2),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
