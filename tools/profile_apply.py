"""On-chip profile of one matrix-free NS apply (the bench.py lane).

Traces a jitted chain of applies with jax.profiler, parses the xplane
proto, and aggregates device-side op durations — the measured answer to
"where does the apply spend its time" (VERDICT r4: profile one apply and
attack the measured top item).  Reference role: the perf counters around
``performance.cc:83-142``.

Usage::

    python tools/profile_apply.py [--dim 3] [--ref 5] [--degree 2]
                                  [--turek | --turek2d | --sphere]
                                  [--reps 64] [--top 40]
"""

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=3)
    ap.add_argument("--ref", type=int, default=5)
    ap.add_argument("--degree", type=int, default=2)
    ap.add_argument("--turek", action="store_true")
    ap.add_argument("--turek2d", action="store_true")
    ap.add_argument("--sphere", action="store_true")
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--flavor", default="vmult", choices=["vmult"])
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ns_gls_tpu.utils.precision import ensure_tpu_matmul_precision

    ensure_tpu_matmul_precision()
    import bench

    if a.turek:
        op, space, u = bench.build_turek(2, a.degree)
    elif a.turek2d:
        op, space, u = bench.build_turek2d(4, a.degree)
    elif a.sphere:
        op, space, u = bench.build_sphere(2, a.degree)
    else:
        op, space, u = bench.build(a.dim, a.ref, a.degree)

    apply_fn = op.vmult_pure if hasattr(op, "vmult_pure") else None
    if apply_fn is None:
        fn = op._vmult

        def apply_fn(args, v):
            return fn(args, v)

    args = op.vmult_args

    @jax.jit
    def chain(args, v, n):
        def body(_, v):
            w = apply_fn(args, v)
            return w / jnp.linalg.norm(w.reshape(-1))

        v = jax.lax.fori_loop(0, n, body, v)
        return jnp.linalg.norm(v.reshape(-1))

    u0 = u / jnp.linalg.norm(u.reshape(-1))
    float(chain(args, u0, 2))          # compile + warm
    float(chain(args, u0, a.reps))     # steady-state pass (cache warm)

    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception as e:
        print(json.dumps({"error": f"xplane proto unavailable: {e}"}))
        return

    tdir = tempfile.mkdtemp(prefix="nsprof_")
    try:
        with jax.profiler.trace(tdir):
            float(chain(args, u0, a.reps))
        agg = defaultdict(lambda: [0.0, 0])     # name -> [ps, count]
        plane_tot = defaultdict(float)
        for f in glob.glob(tdir + "/**/*.xplane.pb", recursive=True):
            xs = xplane_pb2.XSpace()
            xs.ParseFromString(open(f, "rb").read())
            for plane in xs.planes:
                if "TPU" not in plane.name and "tpu" not in plane.name:
                    continue
                for line in plane.lines:
                    key = f"{plane.name}::{line.name}"
                    for ev in line.events:
                        nm = plane.event_metadata[ev.metadata_id].name
                        agg[(line.name, nm)][0] += ev.duration_ps
                        agg[(line.name, nm)][1] += 1
                        plane_tot[key] += ev.duration_ps
    finally:
        shutil.rmtree(tdir, ignore_errors=True)

    print("== line totals (us, whole trace of %d reps) ==" % a.reps)
    for k, v in sorted(plane_tot.items(), key=lambda kv: -kv[1]):
        print("  %-60s %10.1f" % (k, v / 1e6))
    # aggregate XLA-op events per apply
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print("== top ops (us/apply over %d reps) ==" % a.reps)
    for (ln, nm), (ps, cnt) in rows[: a.top]:
        print("  %-14s %-72s %8.3f  x%d"
              % (ln[:14], nm[:72], ps / 1e6 / a.reps, cnt))


if __name__ == "__main__":
    main()
