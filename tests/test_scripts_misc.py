"""Tests for the auxiliary CLI scripts: config conversion, unit-test driver
suite map, and the Barr-block math of the MCEq table generator."""

import os

import numpy as np
import pytest

from pisa_tpu.scripts.convert_config import convert_text
from pisa_tpu.scripts.create_barr_sys_tables_mceq import (
    BARR_BLOCKS,
    barr_envelope,
    block_mod_matrix,
)
from pisa_tpu.scripts.run_unit_tests import SUITES


OLD_CFG = """\
#include pisa_examples/resources/settings/binning/example.cfg as binning

[pipeline]
order = data.pi_simple_data_loader, flux.pi_honda_ip, osc.pi_prob3

[data.pi_simple_data_loader]
calc_mode = events

[osc.pi_prob3]
calc_mode = true_allsky_fine
"""


def test_convert_text_renames_and_paths():
    out, notes = convert_text(OLD_CFG)
    assert "pi_" not in out
    assert "data.simple_data_loader, flux.honda_ip, osc.prob3" in out
    assert "[data.simple_data_loader]" in out
    assert "[osc.prob3]" in out
    assert "pisa_examples/resources/" not in out
    assert "#include settings/binning/example.cfg as binning" in out
    assert any("renamed" in n for n in notes)
    assert any("path prefix" in n for n in notes)


def test_convert_text_flags_gated_services():
    _, notes = convert_text("order = osc.nusquids\n")
    assert any("nusquids" in n for n in notes)


def test_convert_config_roundtrip_on_packaged_config(tmp_path):
    # converting an already-new-format config is a no-op that still parses
    from pisa_tpu.utils.resources import find_resource

    src = find_resource("settings/pipeline/osc_example.cfg")
    with open(src) as f:
        text = f.read()
    out, _ = convert_text(text)
    assert out == text


def test_run_unit_tests_suite_paths_exist():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, sel in SUITES.items():
        for item in sel:
            if item.startswith("-") or item == "covariance":
                continue
            assert os.path.exists(os.path.join(repo, item)), (name, item)


def test_barr_envelope_shapes_and_growth():
    e = np.array([1.0, 30.0, 300.0, 3000.0])
    # default block: flat value below threshold, log-growth capped at 1x
    env = barr_envelope(e, "a", 0.2)
    assert env[0] == pytest.approx(0.2)
    assert env[1] == pytest.approx(0.2)
    # cap: maxerr/expected = 1 for default blocks -> never exceeds value
    assert np.all(env <= 0.2 + 1e-12)
    # unbounded extrapolation blocks keep growing above threshold
    env_i = barr_envelope(np.array([500.0, 5000.0, 50000.0]), "i", 0.2)
    assert env_i[0] == pytest.approx(0.2)
    assert env_i[2] > env_i[1] > env_i[0]


def test_block_mod_matrix_selects_rectangle():
    n = 8
    e_grid = np.logspace(0, 3, n)  # 1 GeV .. 1 TeV
    # x_mat: x_lab of secondary bin i at projectile bin j
    x_mat = np.triu(np.ones((n, n)) * 0.3)
    mod = block_mod_matrix(x_mat, e_grid, "a", 0.5)
    # block 'a': x in [0, 0.5], E in (0, 8] GeV -> only low-E columns touched
    touched = e_grid <= 8.0
    assert np.all(mod[np.triu_indices(n)] >= 1.0)
    for j in range(n):
        col = mod[: j + 1, j]
        if touched[j]:
            assert np.all(col == pytest.approx(1.5))
        else:
            assert np.all(col == 1.0)
    # kinematically forbidden lower triangle untouched
    assert np.all(mod[np.tril_indices(n, -1)] == 1.0)


def test_all_blocks_have_valid_rectangles():
    for name, rects in BARR_BLOCKS.items():
        for x_lo, x_hi, e_lo, e_hi in rects:
            assert 0.0 <= x_lo < x_hi <= 1.0, name
            assert 0.0 <= e_lo < e_hi, name


def test_mceq_entry_gated():
    from pisa_tpu.scripts import create_barr_sys_tables_mceq as mod

    with pytest.raises(SystemExit) as exc_info:
        mod.main([])
    assert "MCEq" in str(exc_info.value)
