"""Unit tests for the observability/output utilities."""

import os
import re
import time

import numpy as np

from ns_gls_tpu.fem.space import FESpace
from ns_gls_tpu.mesh.generators import subdivided_hyper_rectangle
from ns_gls_tpu.utils.timer import TimerCollection, monitor, timer, get_collection
from ns_gls_tpu.utils.vtu import write_vtu


def test_timer_scopes_and_table():
    tc = TimerCollection()
    tc.sync = False
    with tc.scope("outer"):
        with tc.scope("inner"):
            time.sleep(0.01)
    with tc.scope("outer"):
        pass
    table = tc.table()
    assert "outer" in table and "outer::inner" in table
    assert tc._data["outer"][0] == 2  # two calls
    assert tc._data["outer::inner"][1] >= 0.01  # total time


def test_global_timer():
    with timer("t_unit_test"):
        pass
    assert "t_unit_test" in get_collection().table()


def test_memory_monitor():
    lines = []
    stats = monitor("unit", logger=lines.append)
    assert "VmRSS" in stats and stats["VmRSS"] > 0
    assert lines and "MONITOR" in lines[0]


def test_vtu_writer_q1_q2(tmp_path):
    for degree in (1, 2):
        mesh = subdivided_hyper_rectangle((2, 2), (0, 0), (1, 1))
        sp = FESpace(mesh, degree)
        u = np.random.default_rng(0).standard_normal((sp.n_nodes, 3))
        fname = str(tmp_path / f"out_q{degree}.vtu")
        write_vtu(fname, sp, u, time=1.5)
        text = open(fname).read()
        assert "VTK_LAGRANGE" not in text  # numeric cell type used
        assert f'NumberOfCells="{mesh.n_cells}"' in text
        assert 'Name="u"' in text and 'Name="p"' in text
        assert "TimeValue" in text
        # cell type 70 = VTK_LAGRANGE_QUADRILATERAL
        assert os.path.getsize(fname) > 100


def test_vtu_3d(tmp_path):
    mesh = subdivided_hyper_rectangle((2, 1, 1), (0, 0, 0), (2, 1, 1))
    sp = FESpace(mesh, 2)
    u = np.zeros((sp.n_nodes, 4))
    fname = str(tmp_path / "out3d.vtu")
    write_vtu(fname, sp, u)
    assert os.path.getsize(fname) > 100


def test_sfc_reorder_keeps_operator(tmp_path):
    """SFC reordering of cells must not change operator results."""
    import jax.numpy as jnp

    from ns_gls_tpu.fem.constraints import AffineConstraints
    from ns_gls_tpu.ops.navier_stokes import NavierStokesOperator
    from ns_gls_tpu.ops.time_integration import BDFIntegrator

    mesh = subdivided_hyper_rectangle((3, 2), (0, 0), (3, 2)).refine_global(1)
    perm = mesh.sfc_order()
    rng = np.random.default_rng(0)

    results = []
    for m in (mesh, mesh.reorder(perm)):
        sp = FESpace(m, 1)
        ca = AffineConstraints(sp.n_nodes, 3).close()
        ti = BDFIntegrator(1)
        ti.update_dt(0.1)
        op = NavierStokesOperator(sp, ca, ca, nu=0.1, c_1=4.0, c_2=2.0,
                                  time_integrator=ti)
        op.constraints_inhomogeneous = ca
        # same nodal field on both (positions-keyed)
        key = np.round(sp.node_pos * 1e8).astype(np.int64)
        vals = rng.standard_normal((10**6, 3))  # hash -> value lookup
        u = vals[(key[:, 0] * 31 + key[:, 1]) % 10**6]
        op.set_linearization_point(jnp.asarray(u))
        r = np.asarray(op.vmult(jnp.asarray(u)))
        # sort by position for comparison
        order = np.lexsort(key.T)
        results.append(r[order])
        rng = np.random.default_rng(0)  # reset for identical field
    assert np.allclose(results[0], results[1], atol=1e-10)
