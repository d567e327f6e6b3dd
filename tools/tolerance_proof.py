"""Reference-grade tolerance proof: Newton at the reference's absolute
1e-7 (``solver_nl.cc:27``) on the Turek 3D Re100 benchmark config, f32
on TPU vs f64 on CPU.

The claim under test: the exact-f32 residual path (HIGHEST matmul
precision in ``residual_fn``, f64-accumulated GMRES dots) removes the
f32 residual floor, so on-chip Newton converges to 1e-7 with the same
iteration counts as a CPU-f64 run — no 5e-4 crutch needed.

Usage::

    python tools/tolerance_proof.py --cpu     # store the f64 baseline
    python tools/tolerance_proof.py           # TPU f32 run + comparison

Writes ``validation/tolerance_{cpu_f64,tpu_f32}.json`` with per-step
Newton iteration counts, final residuals, and the drag/lift series;
the TPU run compares against the stored baseline and reports PASS/FAIL
(same iteration counts within +1, drag agreement to 1e-4).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VAL = os.path.join(os.path.dirname(__file__), "..", "validation")


def run(ref, n_steps, precision, tol):
    from ns_gls_tpu.config import Parameters
    from ns_gls_tpu.driver import Driver
    from ns_gls_tpu.utils import logging as nslog

    nslog.set_verbose(False)
    p = Parameters.from_dict({
        "dim": 3, "fe degree": 2, "mapping degree": 0,
        "n global refinements": ref, "simulation name": "cylinder",
        "cfl": 1.0, "t final": 10.0, "bdf order": 2,
        "time intration": "bdf",
        "c1": 2.0, "c2": 1.0, "nu": 0.001,
        "consider time derivative": True,
        "cell wise stabilization": False,
        "lin relative tolerance": 1e-2,
        "preconditioner": "GMG",
        "gmg coarse grid solver": "direct",
        "gmg coarse grid iterate": False,
        "preconditioner update granularity": "step",
        "nonlinear solver": "Newton", "newton inexact": True,
        "output granularity": 0.0,
        "simulation no slip cylinder": True,
        "simulation no slip wall": True,
        "simulation geometry cylinder shift": 0.005,
        "simulation t init": 0.01, "simulation u max": 2.25,
        "precision": precision,
        "nonlinear tolerance": tol,
    })
    d = Driver(p)
    d.setup()
    d._setup_done = True

    newton_its = []
    residuals = []
    ns = d.nonlinear_solver
    orig = ns.solve

    def recording_solve(u):
        out = orig(u)
        newton_its.append(int(ns.last_iterations))
        residuals.append(float(getattr(ns, "last_residual", float("nan"))))
        return out

    ns.solve = recording_solve
    recs = d.run(max_steps=n_steps)
    return {
        "ref": ref,
        "precision": precision,
        "tol": tol,
        "newton_iterations": newton_its,
        "final_residuals": residuals,
        "drag": [r["drag"] for r in recs],
        "lift": [r["lift"] for r in recs],
        "t": [r["t"] for r in recs],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="CPU f64 baseline run")
    ap.add_argument("--ref", type=int, default=1)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--tol", type=float, default=1e-7)
    a = ap.parse_args()

    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        out = run(a.ref, a.steps, "f64", a.tol)
        path = os.path.join(VAL, f"tolerance_cpu_f64_ref{a.ref}.json")
        json.dump(out, open(path, "w"))
        print(json.dumps({
            "mode": "cpu_f64", "newton_iterations": out["newton_iterations"],
            "final_residuals": out["final_residuals"],
            "drag_last": out["drag"][-1],
        }))
        return

    from ns_gls_tpu.utils.precision import ensure_tpu_matmul_precision

    ensure_tpu_matmul_precision()
    out = run(a.ref, a.steps, "f32", a.tol)
    path = os.path.join(VAL, f"tolerance_tpu_f32_ref{a.ref}.json")
    json.dump(out, open(path, "w"))
    base_path = os.path.join(VAL, f"tolerance_cpu_f64_ref{a.ref}.json")
    verdict = {"mode": "tpu_f32",
               "newton_iterations": out["newton_iterations"],
               "final_residuals": out["final_residuals"],
               "drag_last": out["drag"][-1]}
    if os.path.exists(base_path):
        base = json.load(open(base_path))
        bi = base["newton_iterations"]
        ti = out["newton_iterations"]
        n = min(len(bi), len(ti))
        it_ok = all(ti[k] <= bi[k] + 1 for k in range(n))
        drags = np.array(out["drag"][:n])
        dragb = np.array(base["drag"][:n])
        drag_err = float(np.abs(drags - dragb).max()
                         / max(np.abs(dragb).max(), 1e-12))
        verdict.update({
            "baseline_iterations": bi,
            "iterations_ok": bool(it_ok),
            "drag_rel_err": drag_err,
            "ok": bool(it_ok and drag_err < 1e-4),
        })
    print(json.dumps(verdict))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        # first Mosaic compiles of the wide kernel schedules happen here
        # on a fresh chip (same ladder as bench_step.py): retry once with
        # the narrow per-(comp, plane) kernels; only compile/lowering
        # failures are retried
        import traceback

        traceback.print_exc()
        looks_like_compile = any(
            s in f"{type(e).__name__}: {e}"
            for s in ("Mosaic", "XlaRuntimeError", "lowering",
                      "Unimplemented", "INTERNAL", "UNIMPLEMENTED")
        )
        if os.environ.get("NS_WIDE") == "0" or not looks_like_compile:
            raise
        print("wide kernel failed; retrying narrow (NS_WIDE=0)",
              file=sys.stderr)
        os.environ["NS_WIDE"] = "0"
        os.environ["NS_PRISM_WIDE"] = "0"
        os.execv(sys.executable, [sys.executable] + sys.argv)
