"""Operator-throughput benchmark — the ``gls-vmult`` equivalent
(reference ``performance.cc:12-145``): hypercube mesh, Q_degree, BDF-2
weights, random linearization state; times chained matrix-free NS vmults
and reports MDoF/s per chip.

Prints ONE JSON line (the headline matrix-free number):
  {"metric", "value", "unit", "vs_baseline"}
vs_baseline = fraction of the HBM-roofline model for this apply (bytes
moved / v5e DRAM bandwidth); 0.5 == the BASELINE.md ">50% of roofline"
target.  Secondary lanes (assembled SpMV "mb", vector-Laplace proxy) go
to stderr with --all, mirroring ``performance.cc:83-142``.

Usage: python bench.py [dim] [refinements] [degree] [--all]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(dim=3, refinements=5, degree=2, dtype=jnp.float32,
          fuse_tables=False, increment=False):
    # cached-table mode: tables stream at full HBM bandwidth while extra
    # vector gathers cost ~4ns/row on TPU — cached wins until the pallas
    # windowed-gather kernel lands (see PERF.md)
    from ns_gls_tpu.fem.constraints import AffineConstraints
    from ns_gls_tpu.fem.space import FESpace
    from ns_gls_tpu.mesh.generators import subdivided_hyper_rectangle
    from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
    from ns_gls_tpu.ops.time_integration import BDFIntegrator, SolutionHistory

    mesh = subdivided_hyper_rectangle(
        (1,) * dim, (0.0,) * dim, (1.0,) * dim, colorize=True
    ).refine_global(refinements)
    space = FESpace(mesh, degree)
    C = dim + 1

    ca = AffineConstraints(space.n_nodes, C).close(dtype)
    ti = BDFIntegrator(2)
    ti.update_dt(0.1)
    ti.update_dt(0.1)
    # the default lane applies the fixed-point-flavor operator at the
    # exact-grade f32 precision; --increment mirrors the reference
    # benchmark's own form (``performance.cc:22``: increment_form=true
    # — the Newton Jacobian, every GMRES matvec of a production Newton
    # solve) at the production Jacobian precision (driver.py NS_JAC_PREC
    # default "2x"; the fixed-point flavor demotes "2x" to "3x")
    import os

    op = NavierStokesOperator(
        space, ca, ca, nu=0.1, c_1=4.0, c_2=2.0,
        time_integrator=ti, consider_time_derivative=True,
        increment_form=increment, cell_wise_stabilization=True,
        dtype=dtype, fuse_tables=fuse_tables,
        structured_precision=(
            os.environ.get("NS_JAC_PREC", "2x") if increment else "3x"
        ),
    )
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((space.n_nodes, C)), dtype)
    hist = SolutionHistory([u, u * 0.9, u * 0.8])
    op.set_previous_solution(hist)
    op.set_linearization_point(u)
    return op, space, u


def build_turek(refinements=2, degree=2, dtype=jnp.float32):
    """Flagship-geometry lane: the real (curved, extruded) Turek 3D mesh
    (``grid_cylinder.h:153-242``) instead of the hypercube — exercises the
    prism fused sweep (ops/prism.py), i.e. the operator the BASELINE
    time/step metric actually runs."""
    from ns_gls_tpu.fem.constraints import AffineConstraints
    from ns_gls_tpu.fem.space import FESpace
    from ns_gls_tpu.mesh.cylinder import cylinder_mesh_3d
    from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
    from ns_gls_tpu.ops.time_integration import BDFIntegrator, SolutionHistory

    mesh = cylinder_mesh_3d().refine_global(refinements)
    space = FESpace(mesh, degree)
    C = 4
    ca = AffineConstraints(space.n_nodes, C).close(dtype)
    ti = BDFIntegrator(2)
    ti.update_dt(0.1)
    ti.update_dt(0.1)
    op = NavierStokesOperator(
        space, ca, ca, nu=0.001, c_1=2.0, c_2=1.0,
        time_integrator=ti, consider_time_derivative=True,
        increment_form=True, cell_wise_stabilization=False, dtype=dtype,
    )
    op.constraints_inhomogeneous = ca
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((space.n_nodes, C)), dtype)
    hist = SolutionHistory([u, u * 0.9, u * 0.8])
    op.set_previous_solution(hist)
    op.set_linearization_point(u)
    return op, space, u


def build_turek2d(refinements=4, degree=2, dtype=jnp.float32):
    """General-2D-mesh lane: the curved Turek 2D mesh — the corridor and
    validation configs (``grid_cylinder.h:7-151``).  Exercises the
    patch-lattice fused sweep (ops/patch2d.py), i.e. the general-mesh
    answer to ``do_vmult_cell`` (operator_ns.cc:949-1182)."""
    from ns_gls_tpu.fem.constraints import AffineConstraints
    from ns_gls_tpu.fem.space import FESpace
    from ns_gls_tpu.mesh.cylinder import cylinder_mesh_2d
    from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
    from ns_gls_tpu.ops.time_integration import BDFIntegrator, SolutionHistory

    mesh = cylinder_mesh_2d().refine_global(refinements)
    if refinements < 0:
        # adaptive lane (--turek2d-adaptive): refine-in-wake on top of
        # |refinements| global levels (``simulation.cc:317-326``) —
        # mixed-depth cells, multi-family patch sweep
        mesh = cylinder_mesh_2d().refine_global(-refinements)
        c = mesh.vertices[mesh.cells].mean(axis=1)
        wake = (c[:, 0] > 0.3) & (c[:, 0] < 1.2) & (np.abs(c[:, 1]) < 0.12)
        mesh = mesh.refine(wake)
    space = FESpace(mesh, degree)
    C = 3
    ca = AffineConstraints(space.n_nodes, C).close(dtype)
    ti = BDFIntegrator(2)
    ti.update_dt(0.1)
    ti.update_dt(0.1)
    op = NavierStokesOperator(
        space, ca, ca, nu=0.001, c_1=2.0, c_2=1.0,
        time_integrator=ti, consider_time_derivative=True,
        increment_form=True, cell_wise_stabilization=False, dtype=dtype,
    )
    op.constraints_inhomogeneous = ca
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((space.n_nodes, C)), dtype)
    hist = SolutionHistory([u, u * 0.9, u * 0.8])
    op.set_previous_solution(hist)
    op.set_linearization_point(u)
    return op, space, u


def build_sphere(refinements=2, degree=2, dtype=jnp.float32):
    """General-3D-mesh lane: the Gmsh sphere mesh
    (``simulation.cc:852-908``).  Exercises the patch-3D fused sweep
    (ops/patch3d.py) — the last mesh family off the fast path."""
    from ns_gls_tpu.fem.constraints import AffineConstraints
    from ns_gls_tpu.fem.space import FESpace
    from ns_gls_tpu.mesh.gmsh import read_msh
    from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
    from ns_gls_tpu.ops.time_integration import BDFIntegrator, SolutionHistory

    mesh = read_msh("meshes/sphere.msh").refine_global(refinements)
    space = FESpace(mesh, degree)
    C = 4
    ca = AffineConstraints(space.n_nodes, C).close(dtype)
    ti = BDFIntegrator(2)
    ti.update_dt(0.1)
    ti.update_dt(0.1)
    op = NavierStokesOperator(
        space, ca, ca, nu=0.001, c_1=2.0, c_2=1.0,
        time_integrator=ti, consider_time_derivative=True,
        increment_form=True, cell_wise_stabilization=False, dtype=dtype,
    )
    op.constraints_inhomogeneous = ca
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((space.n_nodes, C)), dtype)
    hist = SolutionHistory([u, u * 0.9, u * 0.8])
    op.set_previous_solution(hist)
    op.set_linearization_point(u)
    return op, space, u


def time_apply(apply_fn, args, u, n_rep=None) -> float:
    """Honest steady-state seconds/apply: chained applies inside one jit
    (each iteration consumes the previous, normalized, output).

    The rep count auto-scales so the chained work dominates dispatch
    latency jitter (the tunneled-TPU dispatch is ~29 ms with multi-ms
    jitter; a too-short chain under-resolves to garbage), and the
    measurement takes the best of three differences."""

    @jax.jit
    def chain(args, v, n):
        def body(_, v):
            w = apply_fn(args, v)
            return w / jnp.linalg.norm(w.reshape(-1))

        v = jax.lax.fori_loop(0, n, body, v)
        return jnp.linalg.norm(v.reshape(-1))

    # the chain returns a SCALAR and the measurement fetches it:
    # block_until_ready does not actually wait under the tunneled-TPU
    # runtime, and fetching a full vector hauls megabytes per sync —
    # a 4-byte scalar fetch is the only honest completion barrier here
    def sync(n):
        return float(chain(args, u0, n))

    u0 = u / jnp.linalg.norm(u.reshape(-1))
    sync(2)  # warm up + compile
    if n_rep is None:
        t0 = time.perf_counter()
        sync(32)
        t1 = time.perf_counter()
        sync(1)
        t2 = time.perf_counter()
        pilot = max(((t1 - t0) - (t2 - t1)) / 31, 1e-7)
        n_rep = int(np.clip(0.5 / pilot, 100, 20000))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        sync(n_rep)
        t1 = time.perf_counter()
        sync(1)
        t2 = time.perf_counter()
        best = min(best, max((t1 - t0) - (t2 - t1), 1e-9) / (n_rep - 1))
    return best


def roofline_seconds(op, space, dtype) -> float:
    """Bytes moved per apply / HBM bandwidth (v5e: ~819 GB/s)."""
    bs = jnp.dtype(dtype).itemsize
    n_c = space.mesh.n_cells
    n_q = space.element.n_q
    n_loc = space.element.n_loc
    d = space.dim
    C = d + 1
    n_dofs = space.n_nodes * C
    fused = op.fuse_tables
    n_vec_reads = 3 if fused else 1  # u + (u_lin + vec_old | tables)
    state_bytes = 0 if fused else n_c * n_q * (d + d * d + d + d) * bs
    delta_bytes = n_c * (1 if op.cell_wise_stabilization else n_q) * 2 * bs
    geom_q = 1 if op.affine_geometry else n_q
    geom_bytes = n_c * (geom_q * d * d + n_q) * bs
    gather_bytes = n_c * n_loc * 4
    vec_bytes = (n_vec_reads + 1) * n_dofs * bs
    total = state_bytes + delta_bytes + geom_bytes + gather_bytes + vec_bytes
    BW = 819e9
    return total / BW


def main():
    import subprocess

    from ns_gls_tpu.utils.precision import ensure_tpu_matmul_precision

    # the tunneled-TPU backend init HANGS indefinitely (inside native
    # code — signals don't fire) when the relay is down (observed: a
    # multi-hour pool outage). Probe in a subprocess first and fail
    # fast with a recordable error line instead of wedging the caller.
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=240, check=True, capture_output=True,
        )
    except Exception as e:
        print(json.dumps({
            "metric": "ns_vmult_mdof_per_s",
            "value": 0.0,
            "unit": f"ERROR: device backend init failed "
                    f"({type(e).__name__}; TPU tunnel down?)",
            "vs_baseline": 0.0,
        }))
        raise SystemExit(1)

    ensure_tpu_matmul_precision()
    jax.config.update(
        "jax_compilation_cache_dir",
        f"/tmp/jax_cache_bench_{jax.default_backend()}",
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    show_all = "--all" in sys.argv
    turek = "--turek" in sys.argv
    turek2d = "--turek2d" in sys.argv or "--turek2d-adaptive" in sys.argv
    sphere = "--sphere" in sys.argv
    dtype = jnp.float32

    def measure_with_fallback(build_fn, *bargs, retries=()):
        """First Mosaic compiles happen here; if the chip's compiler
        rejects a kernel schedule, retry progressively simpler paths so
        the benchmark still reports a number.  ``retries``: extra
        fallback env settings tried in order after the wide->narrow
        step (e.g. ("NS_PATCH2D", "0") to drop to the general sweep)."""
        import os
        import traceback

        plans = [{"NS_WIDE": "0", "NS_PRISM_WIDE": "0"}]
        for k, v in retries:
            plans.append({**plans[-1], k: v})
        op, space, u = build_fn(*bargs)
        try:
            return op, space, u, time_apply(op.vmult_pure, op.vmult_args, u)
        except Exception:
            traceback.print_exc(file=sys.stderr)
        for env in plans:
            print(f"kernel failed; retrying with {env}", file=sys.stderr)
            os.environ.update(env)
            op, space, u = build_fn(*bargs)
            try:
                return op, space, u, time_apply(
                    op.vmult_pure, op.vmult_args, u
                )
            except Exception:
                traceback.print_exc(file=sys.stderr)
        raise RuntimeError("all kernel fallbacks failed")

    if turek2d:
        import os

        adaptive = "--turek2d-adaptive" in sys.argv
        refinements = int(args[0]) if len(args) > 0 else (
            -3 if adaptive else 4
        )
        degree = int(args[1]) if len(args) > 1 else 2
        op, space, u, dt_p2 = measure_with_fallback(
            build_turek2d, refinements, degree, dtype,
            retries=(("NS_PATCH2D", "0"),),
        )
        path = "patch2d" if op._p2sweep is not None else "general"
        if op._p2sweep is not None and getattr(op._p2sweep, "multi", False):
            path = "patch2d-multifamily"
        # the number this lane exists to beat: the general gather sweep
        os.environ["NS_PATCH2D"] = "0"
        op_g, _, _, dt_g = measure_with_fallback(
            build_turek2d, refinements, degree, dtype
        )
        del os.environ["NS_PATCH2D"]
        n_dofs = space.n_nodes * 3
        mdofs = n_dofs / dt_p2 / 1e6
        frac = roofline_seconds(op, space, dtype) / dt_p2
        print(f"general sweep: {n_dofs / dt_g / 1e6:.1f} MDoF/s "
              f"({dt_g * 1e3:.3f} ms); speedup {dt_g / dt_p2:.2f}x",
              file=sys.stderr)
        print(json.dumps({
            "metric": "ns_vmult_turek2d_mdof_per_s",
            "value": round(mdofs, 2),
            "unit": f"MDoF/s/chip (Turek 2D ref={refinements} Q{degree}, "
                    f"{n_dofs} dofs, f32, {path} sweep; "
                    f"{dt_g / dt_p2:.2f}x vs general)",
            "vs_baseline": round(frac, 4),
        }))
        return
    if sphere:
        import os

        refinements = int(args[0]) if len(args) > 0 else 2
        degree = int(args[1]) if len(args) > 1 else 2
        op, space, u, dt_p3 = measure_with_fallback(
            build_sphere, refinements, degree, dtype,
            retries=(("NS_PATCH3D", "0"),),
        )
        path = "patch3d" if op._p3sweep is not None else "general"
        os.environ["NS_PATCH3D"] = "0"
        op_g, _, _, dt_g = measure_with_fallback(
            build_sphere, refinements, degree, dtype
        )
        del os.environ["NS_PATCH3D"]
        n_dofs = space.n_nodes * 4
        mdofs = n_dofs / dt_p3 / 1e6
        frac = roofline_seconds(op, space, dtype) / dt_p3
        print(f"general sweep: {n_dofs / dt_g / 1e6:.1f} MDoF/s "
              f"({dt_g * 1e3:.3f} ms); speedup {dt_g / dt_p3:.2f}x",
              file=sys.stderr)
        print(json.dumps({
            "metric": "ns_vmult_sphere_mdof_per_s",
            "value": round(mdofs, 2),
            "unit": f"MDoF/s/chip (sphere ref={refinements} Q{degree}, "
                    f"{n_dofs} dofs, f32, {path} sweep; "
                    f"{dt_g / dt_p3:.2f}x vs general)",
            "vs_baseline": round(frac, 4),
        }))
        return
    if turek:
        refinements = int(args[0]) if len(args) > 0 else 2
        degree = int(args[1]) if len(args) > 1 else 2
        op, space, u, dt_mf = measure_with_fallback(
            build_turek, refinements, degree, dtype
        )
        n_dofs = space.n_nodes * 4
        mdofs = n_dofs / dt_mf / 1e6
        frac = roofline_seconds(op, space, dtype) / dt_mf
        path = ("prism" if op._psweep is not None else
                "structured" if op._ssweep is not None else "general")
        print(json.dumps({
            "metric": "ns_vmult_turek3d_mdof_per_s",
            "value": round(mdofs, 2),
            "unit": f"MDoF/s/chip (Turek 3D ref={refinements} Q{degree}, "
                    f"{n_dofs} dofs, f32, {path} sweep)",
            "vs_baseline": round(frac, 4),
        }))
        return
    dim = int(args[0]) if len(args) > 0 else 3
    refinements = int(args[1]) if len(args) > 1 else 5
    degree = int(args[2]) if len(args) > 2 else 2
    increment = "--increment" in sys.argv

    op, space, u, dt_mf = measure_with_fallback(
        build, dim, refinements, degree, dtype, False, increment
    )
    n_dofs = space.n_nodes * (dim + 1)
    mdofs = n_dofs / dt_mf / 1e6
    frac = roofline_seconds(op, space, dtype) / dt_mf

    if show_all:
        # assembled SpMV lane ("ns::vmult::mb", performance.cc:89-95)
        from ns_gls_tpu.ops.matrix_based import NavierStokesOperatorMatrixBased

        mb = NavierStokesOperatorMatrixBased(op)
        dt_mb = time_apply(mb.vmult_pure, mb.vmult_args, u)
        print(
            f"ns::vmult::mb  {n_dofs / dt_mb / 1e6:10.1f} MDoF/s"
            f"  ({dt_mb * 1e3:.3f} ms)",
            file=sys.stderr,
        )
        print(
            f"ns::vmult::mf  {mdofs:10.1f} MDoF/s  ({dt_mf * 1e3:.3f} ms)",
            file=sys.stderr,
        )

        # vector mass+Laplace matrix-free lane — the bandwidth-roofline
        # proxy ("poisson::vmult::mf", performance.cc:97-142): same gather/
        # evaluate/integrate structure, trivial q-point physics
        from ns_gls_tpu.ops.navier_stokes import fe_evaluate, fe_integrate

        batch = op.batch

        def poisson_apply(b, v):
            v_loc = v[b.cell_nodes]
            val, grad = fe_evaluate(b.S, b.D, b.jinv, v_loc)
            r_loc = fe_integrate(b.S, b.D, b.jinv, b.jxw, val, grad)
            C = v.shape[1]
            flat = r_loc.reshape(-1, C)
            flat = jnp.concatenate(
                [flat, jnp.zeros((1, C), v.dtype)], axis=0
            )
            parts = [flat[idx].sum(axis=1) for idx in b.node_gather]
            return jnp.concatenate(parts, axis=0)

        dt_po = time_apply(poisson_apply, batch, u)
        print(
            f"poisson::vmult::mf {n_dofs / dt_po / 1e6:7.1f} MDoF/s"
            f"  ({dt_po * 1e3:.3f} ms)",
            file=sys.stderr,
        )

    form = ("increment (Jacobian, performance.cc:22 form, "
            "production NS_JAC_PREC)" if increment else "fixed-point")
    print(
        json.dumps(
            {
                "metric": ("ns_vmult_increment_mdof_per_s" if increment
                           else "ns_vmult_mdof_per_s"),
                "value": round(mdofs, 2),
                "unit": f"MDoF/s/chip (dim={dim} ref={refinements} Q{degree}, "
                        f"{n_dofs} dofs, f32, {form}; vs_baseline = fraction "
                        "of the ideal HBM-roofline apply — no published "
                        "reference numbers exist, see BASELINE.md)",
                "vs_baseline": round(frac, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
