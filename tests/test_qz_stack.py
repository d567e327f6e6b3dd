"""qz sublane-stacking schedule of the 3D structured Pallas kernel
(NS_QZ_STACK=1, ops/structured.py): one q-point physics pass on
(NQ*R, L) row-stacked tiles must match the per-qz loop bit-for-bit in
exact arithmetic (same contractions, different instruction schedule).

Covers both flavors (vmult increment/fixed + residual via ``check``),
diagonal and sheared (full-jinv) geometry, cell-wise and q-point
stabilization, Q1 and Q2 — the same matrix test_structured.py runs for
the default schedule.  Reference physics: ``operator_ns.cc:949-1182``.
"""

import pytest

import tests.test_structured as ts


@pytest.fixture(autouse=True)
def _qz_stack_env(monkeypatch):
    monkeypatch.setenv("NS_QZ_STACK", "1")
    yield


@pytest.mark.parametrize("increment,cell_wise", [(False, False), (True, True)])
def test_qz_stack_3d_q1(increment, cell_wise):
    ts.check(3, 1, increment, cell_wise)


@pytest.mark.parametrize("increment", [False, True])
def test_qz_stack_3d_q2(increment):
    ts.check(3, 2, increment, True)


def test_qz_stack_3d_q2_qpoint_stab():
    ts.check(3, 2, True, False)


def test_qz_stack_sheared():
    ts.check(3, 1, True, True, shear=0.35)


def test_qz_stack_narrow(monkeypatch):
    """Stacking composes with the narrow (NS_WIDE=0) forward too
    (both flags are read at sweep construction, ops/structured.py)."""
    monkeypatch.setenv("NS_WIDE", "0")
    ts.check(3, 1, True, False)


# ---- prism kernel: the same stacking on its qy loop (ops/prism.py) ----
import tests.test_prism as tp


@pytest.mark.parametrize("increment,cell_wise", [(False, False), (True, True)])
def test_qz_stack_prism_q1(increment, cell_wise):
    tp.check(tp.prism_mesh(1), 1, increment, cell_wise)


def test_qz_stack_prism_q2():
    tp.check(tp.prism_mesh(1), 2, True, False)


def test_qz_stack_prism_turek3d():
    from ns_gls_tpu.mesh.cylinder import cylinder_mesh_3d

    tp.check(cylinder_mesh_3d(), 1, True, True)
