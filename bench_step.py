"""Time-per-step benchmark: the BASELINE.md "Turek 3D Re100" metric.

Runs the driver on the Turek 3D Re100 configuration (Q2, BDF-2, CFL 1.0,
GMG + direct coarse, inexact Newton, lin rtol 1e-2 — reference
``input_turek_3D_Re100.json``) at a configurable refinement level, times a
few steps after warmup, and prints one JSON line.

Usage: python bench_step.py [n_refinements] [n_steps]
"""

import json
import sys
import time


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        f"/tmp/jax_cache_bench_{jax.default_backend()}",
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    n_ref = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from ns_gls_tpu.config import Parameters
    from ns_gls_tpu.driver import Driver
    from ns_gls_tpu.utils import logging as nslog

    nslog.set_verbose(False)

    p = Parameters.from_dict(
        {
            "dim": 3,
            "fe degree": 2,
            "mapping degree": 0,
            "n global refinements": n_ref,
            "simulation name": "cylinder",
            "cfl": 1.0,
            "t final": 20.0,
            "bdf order": 2,
            "time intration": "bdf",
            "c1": 2.0,
            "c2": 1.0,
            "nu": 0.001,
            "consider time derivative": True,
            "cell wise stabilization": False,
            "lin relative tolerance": 1e-2,
            "preconditioner": "GMG",
            "gmg coarse grid solver": "direct",
            # match the reference benchmark config
            # (input_turek_3D_Re100.json): non-iterative coarse solve
            "gmg coarse grid iterate": False,
            # rebuild smoother/coarse data once per step (PERF.md)
            "preconditioner update granularity": "step:5",
            "nonlinear solver": "Newton",
            "newton inexact": True,
            "output granularity": 0.0,
            "simulation no slip cylinder": True,
            "simulation no slip wall": True,
            "simulation geometry cylinder shift": 0.005,
            "simulation t init": 0.01,
            "simulation u max": 2.25,
            "precision": "f32",  # TPU-native outer precision
            # f32 residual rounding floor sits near 1e-4 at these scales
            "nonlinear tolerance": 5e-4,
        }
    )
    d = Driver(p)
    d.setup()
    d._setup_done = True
    n_dofs = d.space.n_nodes * 4

    # warmup: first step compiles everything
    t0 = time.perf_counter()
    d.run(max_steps=1)
    warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ns_gls_tpu.fem.constraints import distribute

    t = 0.0
    for k in range(n_steps):
        u_max = d.op.get_max_u(d.solution.current)
        dt = d.mesh.minimal_cell_diameter() * p.cfl / max(u_max, 2.25)
        d.op.constraints_inhomogeneous = d.csets.inhomogeneous_at(t)
        d.time_integrator.update_dt(dt)
        d.op.update_weight()
        for op_l in d.mg_ops:
            op_l.update_weight()
        d.solution.commit()
        d._set_previous_solution()
        d._precond_stale = True
        new_u = d.nonlinear_solver.solve(d.solution.current)
        new_u = distribute(d.op.constraints_inhomogeneous, new_u)
        new_u = distribute(d.csets.full, new_u)
        d.solution.current = new_u
        t += dt
    import jax

    jax.block_until_ready(d.solution.current)
    per_step = (time.perf_counter() - t0) / n_steps

    print(
        json.dumps(
            {
                "metric": "turek3d_re100_time_per_step",
                "value": round(per_step, 4),
                "unit": f"s/step (ref={n_ref}, {n_dofs} dofs, f32, "
                        f"warmup {warm:.1f}s)",
                "vs_baseline": round(per_step, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
