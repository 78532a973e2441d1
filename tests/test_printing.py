"""Pretty-printer smoke tests (print.cpp analogues)."""

import numpy as np

from idg_tpu.utils.printing import (
    format_saver,
    print_device_info,
    print_parameters,
    print_subgrid,
    print_subgrid_diff,
    print_visibilities,
    print_visibilities_diff,
)


def test_print_parameters(small_params, capsys):
    print_parameters(small_params)
    out = capsys.readouterr().out
    assert "PARAMETERS" in out
    assert "Number of baselines" in out
    assert str(small_params.nr_subgrids) in out


def test_print_subgrid_and_diff(capsys):
    sub = (np.arange(2 * 4 * 8 * 8) % 7 + 1j).reshape(2, 4, 8, 8).astype(np.complex64)
    print_subgrid(sub)
    print_subgrid_diff(sub, sub * 1.001)
    out = capsys.readouterr().out
    assert "(" in out and ")" in out


def test_print_visibilities_and_diff(capsys):
    vis = np.ones((2, 3, 4, 4), dtype=np.complex64)
    print_visibilities(vis)
    print_visibilities_diff(vis, vis * 0.5)
    out = capsys.readouterr().out
    assert "t=0 c=0" in out


def test_format_saver_restores_printoptions():
    before = np.get_printoptions()["precision"]
    with format_saver():
        np.set_printoptions(precision=1)
    assert np.get_printoptions()["precision"] == before


def test_print_device_info(capsys):
    print_device_info()
    out = capsys.readouterr().out
    assert "Device info" in out
