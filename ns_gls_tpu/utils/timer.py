"""Hierarchical wall-time accounting (observability layer).

TPU-native equivalent of the reference's scope-timer stack
(``timer.h``: MyTimerOutput/MyScope/ScopedName/TimerCollection): RAII
scopes build ``parent::child`` labels from a path stack, a global registry
accumulates min/max/avg wall times, and a table is printed at the end of a
run.  Device work inside a scope is synchronized on exit so times are
honest.  For kernel-level traces, wrap runs in ``jax.profiler`` (see
``profile_trace``).
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict


class TimerCollection:
    """Global registry of path-labelled wall-time accumulators
    (``timer.h:194-253``)."""

    def __init__(self):
        import os

        self._data = defaultdict(lambda: [0, 0.0, float("inf"), 0.0])
        self._path = threading.local()
        self.sync = True
        # fence depth: each fence costs a device round trip (~29 ms
        # dispatch + fetch on the tunneled TPU), and a production step
        # enters ~30 nested scopes — fencing them all costs ~1 s/step of
        # pure synchronization. Default: fence only top-level scopes
        # (depth 1 — the "loop" scope bench_step's s/step metric reads),
        # so the headline numbers stay honest while nested attribution
        # is dispatch-free. NS_TIMER_FENCE=all restores per-scope
        # fencing for on-chip phase profiling; =off disables fencing.
        mode = os.environ.get("NS_TIMER_FENCE", "top")
        self.fence_depth = (
            10**9 if mode == "all" else 0 if mode == "off" else 1
        )
        self._tok_fn = None
        self._tok = None

    def _fence(self):
        """Honest device completion barrier: enqueue a trivial program on
        the (in-order) device compute stream and FETCH its 4-byte result.
        Under the tunneled TPU runtime ``block_until_ready`` returns
        before queued work finishes; only a data fetch waits (PERF.md) —
        this mirrors the ``bench.py`` scalar-fetch pattern so per-scope
        attribution of async device work is trustworthy
        (reference ``timer.h:194-253`` semantics)."""
        import jax
        import jax.numpy as jnp

        if self._tok_fn is None:
            self._tok_fn = jax.jit(lambda x: x + 1.0)
            self._tok = jnp.float32(0.0)
        self._tok = self._tok_fn(self._tok)
        float(self._tok)

    def _stack(self):
        if not hasattr(self._path, "stack"):
            self._path.stack = []
        return self._path.stack

    @contextlib.contextmanager
    def scope(self, name: str):
        stack = self._stack()
        stack.append(name)
        label = "::".join(stack)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync and len(stack) <= self.fence_depth:
                try:
                    self._fence()
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            rec = self._data[label]
            rec[0] += 1
            rec[1] += dt
            rec[2] = min(rec[2], dt)
            rec[3] = max(rec[3], dt)
            stack.pop()

    def reset(self):
        self._data.clear()

    def table(self) -> str:
        if not self._data:
            return "(no timers recorded)"
        w = max(len(k) for k in self._data) + 2
        lines = [
            f"{'scope'.ljust(w)} {'n':>6} {'total[s]':>10} {'avg[s]':>10}"
            f" {'min[s]':>10} {'max[s]':>10}"
        ]
        for k in sorted(self._data):
            n, tot, mn, mx = self._data[k]
            lines.append(
                f"{k.ljust(w)} {n:>6} {tot:>10.4f} {tot / n:>10.4f}"
                f" {mn:>10.4f} {mx:>10.4f}"
            )
        return "\n".join(lines)

    def print_all(self):
        print(self.table(), flush=True)


_collection = TimerCollection()


def timer(name: str):
    """``with timer("a"): ... with timer("b")`` records scope ``a::b``."""
    return _collection.scope(name)


def get_collection() -> TimerCollection:
    return _collection


def print_wall_time_statistics():
    _collection.print_all()


def monitor(label: str = "", logger=print):
    """Memory monitor (reference ``timer.h:24-54``): VmPeak/VmSize/VmHWM/
    VmRSS from /proc/self/status plus device memory stats when available."""
    stats = {}
    try:
        with open("/proc/self/status") as f:
            for line in f:
                for key in ("VmPeak", "VmSize", "VmHWM", "VmRSS"):
                    if line.startswith(key):
                        stats[key] = int(line.split()[1]) // 1024  # MB
    except OSError:
        pass
    try:
        import jax

        for dev in jax.local_devices():
            ms = dev.memory_stats() or {}
            if "bytes_in_use" in ms:
                stats[f"{dev.device_kind}:bytes_in_use"] = (
                    ms["bytes_in_use"] // 2**20
                )
    except Exception:
        pass
    logger(
        f"    [MONITOR] {label} "
        + " ".join(f"{k}={v}MB" for k, v in stats.items())
    )
    return stats


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace around a region (xprof-compatible)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
