"""Config parsing: the reference's input/*.json files must be consumable
as-is (same flat key schema, including the 'time intration' spelling)."""

import glob
import os

import pytest

from ns_gls_tpu.config import Parameters

REF_INPUTS = sorted(glob.glob("/root/reference/input/*.json"))


def test_defaults_match_reference():
    p = Parameters()
    # reference defaults (main.cc:66-115)
    assert p.fe_degree == 1
    assert p.cfl == 0.1
    assert p.theta == 0.5
    assert p.nu == 0.1
    assert p.c_1 == 4.0 and p.c_2 == 2.0
    assert p.linear_solver == "GMRES"
    assert p.lin_relative_tolerance == 1e-8
    assert p.preconditioner == "ILU"
    assert p.nonlinear_solver == "linearized"
    assert p.gmg.smoothing_n_iterations == 5
    assert p.gmg.smoothing_range == 20.0
    assert p.gmg.coarse_grid_solver == "AMG"


@pytest.mark.skipif(not REF_INPUTS, reason="reference inputs not available")
def test_parse_reference_inputs():
    for f in REF_INPUTS:
        p = Parameters.from_file(f)
        assert p.dim in (2, 3), f
        assert p.time_integration in ("bdf", "theta", "none"), f
        assert p.nonlinear_solver in ("linearized", "Picard", "Newton"), f
        assert p.preconditioner in ("AMG", "GMG", "ILU", "GMG-LS"), f


@pytest.mark.skipif(not os.path.exists(
    "/root/reference/input/input_turek_2D_Re20.json"),
    reason="reference inputs not available")
def test_turek_re20_values():
    p = Parameters.from_file("/root/reference/input/input_turek_2D_Re20.json")
    assert p.dim == 2
    assert p.fe_degree == 1
    assert p.mapping_degree == 0
    assert p.n_global_refinements == 4
    assert p.simulation_name == "cylinder"
    assert p.time_integration == "bdf" and p.bdf_order == 2
    assert p.c_1 == 0.2 and p.c_2 == 0.0 and p.nu == 0.001
    assert p.consider_time_derivative is True
    assert p.cell_wise_stabilization is False
    assert p.preconditioner == "GMG"
    assert p.gmg.coarse_grid_solver == "direct"
    assert p.nonlinear_solver == "Newton" and p.newton_inexact is True
    assert p.extra["simulation u max"] == 0.3


def test_own_inputs_parse():
    for f in sorted(glob.glob(
            os.path.join(os.path.dirname(__file__), "..", "input", "*.json"))):
        p = Parameters.from_file(f)
        assert p.simulation_name in ("channel", "cylinder", "rotation",
                                     "sphere")
