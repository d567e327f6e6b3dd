"""Fused (on-the-fly linearization) operator mode must match the
cached-table mode exactly — same math, different memory layout."""

import jax.numpy as jnp
import numpy as np
import pytest

from ns_gls_tpu.fem.constraints import AffineConstraints, distribute
from ns_gls_tpu.fem.space import FESpace
from ns_gls_tpu.mesh.generators import subdivided_hyper_rectangle
from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
from ns_gls_tpu.ops.time_integration import BDFIntegrator, SolutionHistory


def make_pair(increment_form, cell_wise, dim=2):
    mesh = subdivided_hyper_rectangle(
        (2,) * dim, (0.0,) * dim, (1.0,) * dim, colorize=True
    ).refine_global(1)
    space = FESpace(mesh, 1)
    C = dim + 1
    b = AffineConstraints(space.n_nodes, C)
    b.add_dirichlet(space.boundary_nodes([0]), list(range(dim)),
                    values=[[1.0] + [0.0] * (dim - 1)]
                    * len(space.boundary_nodes([0])))
    ca = b.close()
    ti = BDFIntegrator(2)
    ti.update_dt(0.1)
    ti.update_dt(0.08)

    ops = []
    for fused in (False, True):
        op = NavierStokesOperator(
            space, ca, ca, nu=0.02, c_1=4.0, c_2=2.0,
            time_integrator=ti, consider_time_derivative=True,
            increment_form=increment_form,
            cell_wise_stabilization=cell_wise, fuse_tables=fused,
        )
        op.constraints_inhomogeneous = ca
        ops.append(op)

    rng = np.random.default_rng(0)
    u = distribute(ca, jnp.asarray(rng.standard_normal((space.n_nodes, C))))
    hist = SolutionHistory(
        [u] + [jnp.asarray(rng.standard_normal((space.n_nodes, C)))
               for _ in range(2)]
    )
    for op in ops:
        op.set_previous_solution(hist)
        op.set_linearization_point(u)
    return ops, space, u


@pytest.mark.parametrize("increment", [False, True])
@pytest.mark.parametrize("cell_wise", [True, False])
def test_fused_matches_cached(increment, cell_wise):
    (op_c, op_f), space, u = make_pair(increment, cell_wise)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal(u.shape))
    a = np.asarray(op_c.vmult(v))
    b = np.asarray(op_f.vmult(v))
    assert np.allclose(a, b, atol=1e-12), np.abs(a - b).max()

    ra = np.asarray(op_c.evaluate_residual(u))
    rb = np.asarray(op_f.evaluate_residual(u))
    assert np.allclose(ra, rb, atol=1e-12), np.abs(ra - rb).max()


def test_fused_assembly_matches():
    from ns_gls_tpu.ops import assembly

    (op_c, op_f), space, u = make_pair(True, True)
    Ac = assembly.assemble_dense(op_c)
    Af = assembly.assemble_dense(op_f)
    assert np.allclose(Ac, Af, atol=1e-12)
    dc = np.asarray(assembly.compute_inverse_diagonal(op_c))
    df = np.asarray(assembly.compute_inverse_diagonal(op_f))
    assert np.allclose(dc, df, atol=1e-12)
