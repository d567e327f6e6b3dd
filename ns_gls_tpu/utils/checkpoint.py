"""Checkpoint / resume (SURVEY §5.4: the reference has none — added here
so long Re3900-style runs survive restarts).

Serializes the pytree run state — SolutionHistory vectors, time-integrator
internals, time, step counter.  Two backends: orbax (async-capable,
multi-host-aware; used when importable) and a plain npz fallback.
"""

from __future__ import annotations

import json
import os

import numpy as np


def _orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception:
        return None


def save_checkpoint(path: str, driver, t: float, counter: int) -> None:
    state = {
        f"solution_{i}": np.asarray(v)
        for i, v in enumerate(driver.solution.vectors)
    }
    ti = driver.time_integrator
    raw_dt = getattr(ti, "_dt", None)
    if isinstance(raw_dt, list):
        dt_history = [float(x) for x in raw_dt]
    elif raw_dt is not None:
        dt_history = [float(raw_dt)]
    else:
        dt_history = []
    meta = dict(
        t=t,
        counter=counter,
        dt_history=dt_history,
        n_vectors=len(driver.solution.vectors),
    )

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ocp = _orbax()
    if ocp is not None:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(
            os.path.abspath(path) + ".orbax", state, force=True
        )
    else:
        np.savez(path + ".npz", **state)
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str, driver) -> tuple[float, int]:
    """Restores solution history + integrator dt state; returns (t, counter)."""
    import jax.numpy as jnp

    with open(path + ".json") as f:
        meta = json.load(f)
    ocp = _orbax()
    if ocp is not None and os.path.exists(os.path.abspath(path) + ".orbax"):
        data = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(path) + ".orbax"
        )
    else:
        data = np.load(path + ".npz")
    for i in range(meta["n_vectors"]):
        driver.solution.vectors[i] = jnp.asarray(
            data[f"solution_{i}"], driver.params.dtype
        )
    ti = driver.time_integrator
    dts = meta["dt_history"]
    if hasattr(ti, "_dt"):
        if isinstance(ti._dt, list):
            for dt in reversed(dts):
                if dt > 0:
                    ti.update_dt(dt)
        elif dts:
            ti.update_dt(dts[0])
    return float(meta["t"]), int(meta["counter"])
