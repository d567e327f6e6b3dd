"""GMG-LS: local-smoothing multigrid (``main.cc:569-732``).

Validation strategy:
1. On GLOBALLY refined meshes every level covers the domain, the
   refinement-edge sets are empty, and the LS cycle must degenerate to
   exactly the global-coarsening cycle — compared operator-to-operator.
2. On an ADAPTIVELY refined mesh the LS-preconditioned driver must
   reproduce the GC-preconditioned solution (any consistent
   preconditioner yields the same fixed point) with a healthy
   iteration count (the refinement-edge machinery is wrong iff GMRES
   convergence collapses).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_gls_tpu.config import Parameters
from ns_gls_tpu.utils import logging as nslog

nslog.set_verbose(False)

CFG = {
    "dim": 2,
    "fe degree": 2,
    "n global refinements": 2,
    "simulation name": "channel",
    "cfl": 0.1,
    "t final": 0.1,
    "bdf order": 1,
    "time intration": "bdf",
    "nu": 0.01,
    "consider time derivative": True,
    "lin relative tolerance": 1e-8,
    "gmg coarse grid solver": "direct",
    "nonlinear solver": "Newton",
    "output granularity": 0.0,
}


def test_ls_equals_gc_on_uniform_mesh():
    """Empty edge sets => the LS cycle IS the GC cycle: identical
    solutions (to f32 reduction noise) and iteration counts within the
    omega-estimate wiggle."""
    from ns_gls_tpu.driver import Driver
    from ns_gls_tpu.precond.gmg_ls import PreconditionerGMGLS

    d_gc = Driver(Parameters.from_dict(CFG | {"preconditioner": "GMG"}))
    d_gc.run(max_steps=2)

    d_ls = Driver(Parameters.from_dict(CFG | {"preconditioner": "GMG-LS"}))
    d_ls.run(max_steps=2)
    assert isinstance(d_ls.preconditioner, PreconditionerGMGLS)

    a = np.asarray(d_gc.solution.current)
    b = np.asarray(d_ls.solution.current)
    scale = max(1.0, np.abs(a).max())
    assert np.allclose(a, b, atol=1e-6 * scale), np.abs(a - b).max()
    assert (
        abs(d_ls.linear_solver._last_it - d_gc.linear_solver._last_it) <= 3
    )


def _adaptive_channel_driver(precond):
    """Cylinder driver with 'simulation geometry extra length': the
    refine-in-wake loop (``simulation.cc:317-326``) then refines only
    part of the channel, producing a genuinely adaptive hierarchy."""
    from ns_gls_tpu.driver import Driver

    d = Driver(Parameters.from_dict(CFG | {
        "preconditioner": precond,
        "simulation name": "cylinder",
        "n global refinements": 2,
        "nu": 0.001,
        "simulation u max": 0.3,
        "simulation geometry extra length": 0.8,
        "nonlinear tolerance": 1e-5,
    }))
    return d


def test_ls_adaptive_driver_matches_gc():
    from ns_gls_tpu.precond.gmg_ls import PreconditionerGMGLS

    d_gc = _adaptive_channel_driver("GMG")
    d_gc.run(max_steps=2)
    assert d_gc.mesh.is_adaptive
    gc_its = d_gc.linear_solver._last_it

    d_ls = _adaptive_channel_driver("GMG-LS")
    d_ls.run(max_steps=2)
    assert isinstance(d_ls.preconditioner, PreconditionerGMGLS)
    ls_its = d_ls.linear_solver._last_it

    a = np.asarray(d_gc.solution.current)
    b = np.asarray(d_ls.solution.current)
    scale = max(1.0, np.abs(a).max())
    assert np.allclose(a, b, atol=1e-4 * scale), np.abs(a - b).max()
    # the local-smoothing cycle must stay an effective preconditioner
    assert ls_its <= max(3 * gc_its, gc_its + 10), (ls_its, gc_its)


def test_ls_interface_masks_nontrivial_on_adaptive():
    """The refinement-edge machinery actually engages: some level has a
    non-trivial interface mask and a partial domain covering."""
    d_ls = _adaptive_channel_driver("GMG-LS")
    d_ls.setup()
    masks = d_ls.preconditioner._masks
    assert any(float(np.asarray(m).min()) == 0.0 for m in masks[1:])
    sizes = [s.n_nodes for s in d_ls.mg_spaces]
    assert sizes == sorted(sizes)


def test_rotation_config_uses_ls():
    """The reference rotation.json flavor (Taylor-Couette, GMG-LS + AMG
    coarse) runs through the genuine local-smoothing path."""
    from ns_gls_tpu.driver import Driver
    from ns_gls_tpu.precond.gmg_ls import PreconditionerGMGLS

    p = Parameters.from_file("input/rotation.json")
    p.t_final = 0.05
    p.n_global_refinements = 2
    p.output_granularity = 0.0
    p.paraview_prefix = ""
    d = Driver(p)
    d.run(max_steps=2)
    assert isinstance(d.preconditioner, PreconditionerGMGLS)
    assert np.isfinite(np.asarray(d.solution.current)).all()


def test_pressure_pin_position_is_numbering_independent():
    """The pressure pin must land on the same physical point on the
    fine level and on every MG level under ANY node numbering (round-5
    regression: the index-based pin moved with the patch2d renumbering,
    de-gauging the V-cycle from the system on the rotation config —
    GMRES 90 -> 1590 iterations)."""
    import os

    from ns_gls_tpu.driver import Driver, pressure_pin_candidates

    def pin_pos(patch):
        env = dict(os.environ)
        try:
            if patch:
                os.environ.pop("NS_PATCH2D", None)
            else:
                os.environ["NS_PATCH2D"] = "0"
            p = Parameters.from_file("input/rotation.json")
            p.t_final = 0.05
            p.n_global_refinements = 2
            p.output_granularity = 0.0
            p.paraview_prefix = ""
            d = Driver(p)
            d.setup()
            dim = d.space.dim
            cand = pressure_pin_candidates(d.space)
            assert cand.size > 0
            fine = np.round(np.asarray(d.space.node_pos)[cand[0]], 9)
            lvls = []
            for lop in d.preconditioner.level_ops:
                rows = np.asarray(lop.constraints_homogeneous.rows)
                pn = rows[rows % (dim + 1) == dim] // (dim + 1)
                # the level pin is the first candidate position of the
                # level space that appears among its constrained
                # pressure dofs
                lc = pressure_pin_candidates(lop.space)
                hit = [n for n in lc if n in set(pn.tolist())]
                assert hit, "level lost its pressure pin"
                lvls.append(
                    np.round(np.asarray(lop.space.node_pos)[hit[0]], 9)
                )
            return fine, lvls
        finally:
            os.environ.clear()
            os.environ.update(env)

    f0, l0 = pin_pos(False)
    f1, l1 = pin_pos(True)
    assert (f0 == f1).all(), (f0, f1)
    for lv in l0 + l1:
        assert (lv == f0).all(), (lv, f0)
