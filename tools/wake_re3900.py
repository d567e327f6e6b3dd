"""Re 3900 wake validation: Strouhal number + drag coefficient of
``input/hoffmann_2d_re3900.json`` (the 2D companion of the
reference's ``input_hoffmann_2D_Re3900.json`` — slip walls, uniform
inflow 39) against the literature.

The reference carries Kravchenko & Moin (Phys. Fluids 12(2), 2000) as
its only quantitative target beyond Turek 2D
(``input/input_hoffmann_3D_Re3900.json-metadata:1-3``): 3D LES gives
St = 0.210, c_D = 1.04.  Strictly two-dimensional computations at
Re 3900 are well known to over-predict both (no vortex-stretching
break-up of the rollers): published 2D values cluster at St 0.21-0.26
and c_D 1.2-1.7.  The assertion window below covers the 2D range while
still rejecting a broken shedding cycle (St off by 2x, steady wake, or
drag off the map).

Usage::

    python tools/wake_re3900.py [--ref N] [--t-final T] [--out FILE]

Writes ``validation/wake_re3900_ref{N}.json`` with the full drag/lift
series and the extracted statistics (the stored artifact
``tests/test_wake_re3900.py`` asserts on).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = 0.1            # cylinder diameter (grid_cylinder.h geometry)
U_BAR = 39.0       # the uniform free-stream inflow (u max 39.0)


def wake_stats(t, drag, lift, t_tail):
    """Shedding statistics over the trailing ``t_tail`` of the series.

    Strouhal from the mean upward-zero-crossing period of the lift
    coefficient: St = f D / u_bar.
    """
    m = t > t[-1] - t_tail
    tt, ll = t[m], lift[m]
    up = tt[1:][(ll[:-1] < 0) & (ll[1:] >= 0)]
    period = float(np.diff(up).mean()) if len(up) > 2 else float("nan")
    return {
        "n_periods": max(0, len(up) - 1),
        "period": period,
        "strouhal": D / (period * U_BAR) if period == period else float("nan"),
        "drag_mean": float(drag[m].mean()),
        "drag_max": float(drag[m].max()),
        "lift_rms": float(np.sqrt((ll**2).mean())),
        "t_window": [float(tt[0]), float(tt[-1])],
    }


def _segment(cfg, resume):
    """One driver segment; returns (records, reached_t_final, err_msg)."""
    from ns_gls_tpu.config import Parameters
    from ns_gls_tpu.driver import Driver

    p = Parameters.from_dict(cfg)
    d = Driver(p)
    try:
        d.run(resume=resume)
        return d.sim._history, True, None
    except Exception as e:      # Newton failure on a stiff transient step
        return d.sim._history, False, str(e)


def run(ref, t_final, out_path, nl_tol=1e-6, cfl=None, resume=False):
    """Run the Re 3900 case to ``t_final`` with automatic restart.

    The impulsive-start transient is stiff below the reference's ref-4
    resolution: isolated steps can exceed the 30-iteration Newton cap at
    absolute tolerance (RELATIVE tolerances accept under-converged
    transient steps and blow up — measured: drag -> 587 at t~0.08,
    ref 2; absolute 1e-6 is the working point, ``solver_nl.cc:27`` uses
    1e-7 at ref 4+).  On a Newton failure the run resumes from the last
    checkpoint with CFL cut by 0.7x (permanently — failures cluster in
    the early transient); the partial series is persisted to
    ``<out>.partial`` after every segment so an external kill loses at
    most one checkpoint interval.
    """
    from ns_gls_tpu.utils import logging as nslog

    nslog.set_verbose(False)
    cfg = json.load(
        open(os.path.join(os.path.dirname(__file__), "..",
                          "input", "hoffmann_2d_re3900.json"))
    )
    cfg["n global refinements"] = ref
    cfg["t final"] = t_final
    cfg["output granularity"] = 0.0      # no VTU output, series only
    cfg["paraview prefix"] = ""
    cfg["checkpoint prefix"] = out_path + ".ckpt"
    # ~12 steps/checkpoint at ref-2 dt: a failing segment near the
    # shedding-onset wall (t ~ 0.08) otherwise re-runs minutes of steps
    # it already converged (measured: 6 segments all reset to the same
    # checkpoint while advancing past it in between)
    cfg["checkpoint granularity"] = 0.001
    import jax

    if jax.default_backend() == "cpu":
        # reference-grade outer precision: the absolute Newton tolerance
        # sits below the f32 floor at this case's ||u|| ~ 39 inflow scale
        cfg["precision"] = "f64"
    else:
        # on chip: f32 outer (the config-file default "f64" would run
        # software-emulated f64).  The f32 residual floor is RELATIVE
        # (eps_f32 * ||R_0||, and ||R_0|| ~ 1e5 on the impulsive first
        # step), so an absolute tolerance cannot span the transient —
        # use the per-step relative criterion (--nl-tol is relative
        # here; 1e-6 of the step residual is far below what wake
        # statistics resolve)
        cfg["nonlinear tolerance relative"] = True
        cfg["precision"] = "f32"
    cfg["nonlinear tolerance"] = nl_tol
    # the GLS Newton is linearly convergent near its floor (frozen
    # stabilization in the Jacobian): stiff transient steps that reach
    # 1.2x tol at the reference's 30-iteration cap converge a few
    # iterations later — give them room instead of cutting CFL
    cfg["nonlinear max iterations"] = 100
    if cfl is not None:
        cfg["cfl"] = cfl

    partial = out_path + ".partial"
    prior = []
    if resume and not os.path.exists(cfg["checkpoint prefix"] + ".json"):
        resume = False
    if resume and os.path.exists(partial):
        # the .partial is only written at segment boundaries; a killed
        # segment leaves a valid checkpoint with no series — resume from
        # it anyway (the wake statistics only use the shedding TAIL, so
        # a gap before the resume point does not invalidate them)
        prior = json.load(open(partial))["records"]

    records = list(prior)
    last_resume_t = None
    stuck = 0
    resume_t = 0.0
    for attempt in range(240):
        if resume and not os.path.exists(
                cfg["checkpoint prefix"] + ".json"):
            resume = False      # aborted before the first checkpoint
        if resume:
            meta = json.load(open(cfg["checkpoint prefix"] + ".json"))
            resume_t = meta["t"]
            records = [r for r in records if r["t"] <= resume_t + 1e-12]
            if last_resume_t is not None and resume_t <= last_resume_t:
                stuck += 1
            else:
                stuck = 0
                if cfg.get("nonlinear solver") == "Picard":
                    # the Picard rung pushed past the wall — back to
                    # Newton (quadratic where it works)
                    print("[wake] wall cleared; restoring Newton",
                          file=sys.stderr)
                    cfg["nonlinear solver"] = "Newton"
            last_resume_t = resume_t
            print(f"[wake] segment {attempt}: resume from t = {resume_t:.6g}"
                  f" at cfl = {cfg.get('cfl')}"
                  f" [{cfg.get('nonlinear solver', 'Newton')}]",
                  file=sys.stderr)
        # bounded segments (0.02 time units): the series lives only in
        # process memory during a segment, so a kill mid-segment loses
        # it — short horizons persist the .partial regularly
        horizon = min(resume_t + 0.02, t_final)
        cfg["t final"] = horizon
        seg, done, err = _segment(cfg, resume)
        records.extend(seg)
        json.dump({"records": records, "cfl": cfg.get("cfl")},
                  open(partial, "w"))
        if done:
            if horizon >= t_final:
                break
            resume = True
            continue
        if stuck >= 2 and stuck % 2 == 0:
            # the onset wall: the frozen-tau quasi-Newton cycles ~1.4x
            # ABOVE any tolerance on isolated stiff steps (measured, r5:
            # stalls at 1.4e-5/2.7e-5/6.0e-5 for tol 1e-5/2e-5/4e-5).
            # Picard's linearized-convection fixed point is slower but
            # monotone — ALTERNATE between the two while stuck (the
            # ladder below still advances on odd stuck counts, so each
            # solver gets retried at every CFL rung), then restore
            # Newton once past the wall (the `stuck == 0` branch above).
            new_nl = ("Picard" if cfg.get("nonlinear solver") != "Picard"
                      else "Newton")
            print(f"[wake] segment aborted ({err}); wall at same t — "
                  f"switching to {new_nl} for the next segment",
                  file=sys.stderr)
            cfg["nonlinear solver"] = new_nl
            resume = True
            continue
        # Newton on the GLS system is only LINEARLY convergent near its
        # floor (the stabilization parameters are frozen in the Jacobian,
        # here and in the reference): near shedding onset the residual
        # plateaus at ~1e-6 ABSOLUTE (~1e-9 relative to the step's
        # ||R_0|| ~ 1e2 at this inflow scale) for any cfl/inner
        # tolerance.  Remedy ladder: tighten the inner GMRES once, then
        # relax the absolute tolerance toward 1e-5 (still ~1e-8
        # relative — far below what wake statistics resolve), then cut
        # CFL as the last resort.
        if cfg.get("lin relative tolerance", 1e-2) > 1.5e-3:
            new_lt = cfg.get("lin relative tolerance", 1e-2) * 0.1
            print(f"[wake] segment aborted ({err}); tightening "
                  f"'lin relative tolerance' to {new_lt:g}",
                  file=sys.stderr)
            cfg["lin relative tolerance"] = new_lt
        elif cfg["nonlinear tolerance"] < 0.9 * 4e-5:
            # cap 4e-5 ABSOLUTE ~ 4e-8 of ||R_0|| at this inflow scale:
            # the onset-wall plateau sits at ~1.4x whatever tolerance is
            # set between 1e-6 and 1e-5 (measured, segments 0-5), so the
            # ladder must clear it with margin before touching CFL
            new_tol = min(cfg["nonlinear tolerance"] * 2.0, 4e-5)
            print(f"[wake] segment aborted ({err}); relaxing "
                  f"'nonlinear tolerance' to {new_tol:g}",
                  file=sys.stderr)
            cfg["nonlinear tolerance"] = new_tol
        else:
            print(f"[wake] segment aborted ({err}); cutting cfl "
                  f"{cfg.get('cfl')} -> {cfg.get('cfl', 0.7) * 0.7:.3g}",
                  file=sys.stderr)
            cfg["cfl"] = cfg.get("cfl", 0.7) * 0.7
        resume = True
    else:
        raise RuntimeError("wake run failed to reach t_final after retries")

    return _write_artifact(records, ref, t_final, out_path)


def _write_artifact(records, ref, t_final, out_path):
    t = np.array([r["t"] for r in records])
    drag = np.array([r["drag"] for r in records])
    lift = np.array([r["lift"] for r in records])
    # tail window: at most half the series, at least ~10 target periods
    t_tail = min(0.5 * (t[-1] - t[0]), max(10 * D / (0.21 * U_BAR), 0.05))
    stats = wake_stats(t, drag, lift, t_tail)
    out = {
        "config": "input/hoffmann_2d_re3900.json",
        "ref": ref,
        "t_final": t_final,
        "stats": stats,
        "series": {
            "t": t.tolist(),
            "drag": drag.tolist(),
            "lift": lift.tolist(),
        },
    }
    json.dump(out, open(out_path, "w"))
    print(json.dumps({"ref": ref, **stats}))
    return out


def finalize(ref, out_path):
    """Write the stats artifact from the .partial series of a run that
    was cut short (kill/crash) — the statistics only need the shedding
    tail, not the configured t_final."""
    recs = json.load(open(out_path + ".partial"))["records"]
    return _write_artifact(recs, ref, recs[-1]["t"], out_path)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", type=int, default=3)
    ap.add_argument("--t-final", type=float, default=0.45)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (long runs off-chip)")
    ap.add_argument("--cfl", type=float, default=None)
    ap.add_argument("--nl-tol", type=float, default=1e-6)
    ap.add_argument("--resume", action="store_true",
                    help="continue from <out>.ckpt / <out>.partial")
    ap.add_argument("--finalize", action="store_true",
                    help="write the stats artifact from <out>.partial "
                         "(a run cut short) without running anything")
    a = ap.parse_args()
    out = a.out or os.path.join(
        os.path.dirname(__file__), "..", "validation",
        f"wake_re3900_ref{a.ref}.json",
    )
    if a.finalize:
        finalize(a.ref, out)
        raise SystemExit(0)
    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    run(a.ref, a.t_final, out, nl_tol=a.nl_tol, cfl=a.cfl, resume=a.resume)
