"""Operator-throughput benchmark — the ``gls-vmult`` equivalent
(reference ``performance.cc:12-145``): hypercube mesh, Q_degree, BDF-2
weights, random linearization state; times repeated matrix-free NS vmult
and reports MDoF/s per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the HBM-roofline model for this apply
(bytes moved / chip DRAM bandwidth) — i.e. value 0.5 means 50% of
speed-of-light, the BASELINE.md target for v5e.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(dim=3, refinements=5, degree=2, dtype=jnp.float32):
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
    op = NavierStokesOperator(
        space, ca, ca, nu=0.1, c_1=4.0, c_2=2.0,
        time_integrator=ti, consider_time_derivative=True,
        increment_form=False, cell_wise_stabilization=True, dtype=dtype,
    )
    rng = np.random.default_rng(0)
    u = jnp.asarray(
        rng.standard_normal((space.n_nodes, C)), dtype
    )
    hist = SolutionHistory([u, u * 0.9, u * 0.8])
    op.set_previous_solution(hist)
    op.set_linearization_point(u)
    return op, space, u


def roofline_seconds(op, space, dtype) -> float:
    """Bytes moved per apply / HBM bandwidth (v5e: ~819 GB/s)."""
    bs = jnp.dtype(dtype).itemsize
    n_c = space.mesh.n_cells
    n_q = space.element.n_q
    n_loc = space.element.n_loc
    d = space.dim
    C = d + 1
    n_dofs = space.n_nodes * C
    state_bytes = n_c * n_q * (d + d * d + d + d + 2) * bs  # u*,grad u*,grad p*,dt_old,deltas
    geom_bytes = n_c * n_q * (d * d + 1) * bs
    gather_bytes = n_c * n_loc * 4
    vec_bytes = 2 * n_dofs * bs  # read u + write r (gathers hit cache)
    total = state_bytes + geom_bytes + gather_bytes + vec_bytes
    BW = 819e9  # v5e HBM bandwidth
    return total / BW


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    refinements = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    degree = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    dtype = jnp.float32

    op, space, u = build(dim, refinements, degree, dtype)
    n_dofs = space.n_nodes * (dim + 1)

    # chained applies inside one jit: each iteration consumes the previous
    # output (normalized to stay finite), so nothing can be overlapped,
    # CSE'd, or skipped — honest steady-state timing.
    apply_fn = op.vmult_pure

    @jax.jit
    def chain(args, v, n_rep):
        def body(_, v):
            w = apply_fn(args, v)
            return w / jnp.linalg.norm(w.reshape(-1))

        return jax.lax.fori_loop(0, n_rep, body, v)

    args = op.vmult_args
    u0 = u / jnp.linalg.norm(u.reshape(-1))
    jax.block_until_ready(chain(args, u0, 2))  # warm up + compile

    n_rep = 30
    t0 = time.perf_counter()
    jax.block_until_ready(chain(args, u0, n_rep))
    t1 = time.perf_counter()
    # subtract the loop/normalization overhead via a 1-rep run
    jax.block_until_ready(chain(args, u0, 1))
    t2 = time.perf_counter()
    dt = max((t1 - t0) - (t2 - t1), 1e-9) / (n_rep - 1)

    mdofs = n_dofs / dt / 1e6
    sol = roofline_seconds(op, space, dtype)
    frac = sol / dt
    print(
        json.dumps(
            {
                "metric": "ns_vmult_mdof_per_s",
                "value": round(mdofs, 2),
                "unit": f"MDoF/s/chip (dim={dim} ref={refinements} Q{degree}, "
                        f"{n_dofs} dofs, f32)",
                "vs_baseline": round(frac, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
