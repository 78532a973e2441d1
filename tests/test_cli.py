"""CLI smoke tests (subprocess, CPU, shrunken problems via env vars —
exercising the same env-var config surface as the reference binaries)."""

import json
import os

import pytest
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SMALL_ENV = {
    "GRID_SIZE": "128",
    "SUBGRID_SIZE": "16",
    "NR_STATIONS": "3",
    "NR_TIMESLOTS": "2",
    "NR_TIMESTEPS_SUBGRID": "16",
    "NR_CHANNELS": "8",
    "NR_ITERATIONS": "2",
    "NR_WARM_UP_RUNS": "1",
}


def _run(args, extra_env=None, timeout=300):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, "-m", "idg_tpu"] + args,
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout,
    )


def test_cli_list():
    proc = _run(["list"])
    assert proc.returncode == 0, proc.stderr
    assert "gridder" in proc.stdout and "xla_v4" in proc.stdout


def test_cli_check_gridder():
    proc = _run(
        ["run", "--workload", "gridder", "--version", "xla_v2", "--mode", "check"],
        extra_env=SMALL_ENV,
    )
    assert proc.returncode == 0, proc.stderr
    assert ">>> Result PASSED" in proc.stdout


def test_cli_check_degridder():
    proc = _run(
        ["run", "--workload", "degridder", "--version", "xla_v4", "--mode", "check"],
        extra_env=SMALL_ENV,
    )
    assert proc.returncode == 0, proc.stderr
    assert ">>> Result PASSED" in proc.stdout


def test_cli_perf_writes_csv(tmp_path):
    env = dict(SMALL_ENV, OUTPUT_PATH=str(tmp_path))
    proc = _run(
        ["run", "--workload", "gridder", "--version", "xla_v2", "--mode", "perf"],
        extra_env=env,
    )
    assert proc.returncode == 0, proc.stderr
    csvs = list(tmp_path.glob("*gridder_xla_v2-tpu.csv"))
    assert len(csvs) == 1
    lines = csvs[0].read_text().strip().splitlines()
    metrics = dict(line.split(",") for line in lines)
    assert set(metrics) >= {"ms", "GFLOP/s", "GB/s", "FLOP/Byte", "MVis/s"}


def test_cli_perf_sharded(tmp_path):
    env = dict(
        SMALL_ENV,
        OUTPUT_PATH=str(tmp_path),
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    proc = _run(
        ["run", "--workload", "gridder", "--version", "xla_v2",
         "--mode", "perf", "--mesh", "8"],
        extra_env=env,
    )
    assert proc.returncode == 0, proc.stderr


def test_bench_emits_one_json_line(tmp_path):
    env = dict(os.environ)
    env.update(SMALL_ENV)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env["BENCH_KERNEL"] = "xla_v2"
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    assert set(payload) >= {"metric", "value", "unit", "vs_baseline"}
    assert payload["value"] > 0
    # the degridder rides the same line (round-5: driver-visible tracking
    # of both workloads); absent only if every degridder candidate failed
    assert payload.get("degridder_value", 1) > 0
    if "degridder_metric" in payload:
        assert payload["degridder_unit"] == "MVis/s"


def test_cli_grid_stage(tmp_path):
    env = dict(SMALL_ENV, OUTPUT_PATH=str(tmp_path), NR_WINDOWS="2")
    proc = _run(["grid"], extra_env=env)
    assert proc.returncode == 0, proc.stderr
    csvs = list(tmp_path.glob("*grid_add-tpu.csv"))
    assert len(csvs) == 1
    metrics = dict(
        line.split(",") for line in csvs[0].read_text().strip().splitlines()
    )
    assert set(metrics) >= {"ms", "ms_stddev", "GFLOP/s", "GB/s"}


def test_cli_scaling_pipeline():
    env = dict(
        SMALL_ENV,
        NR_TIMESLOTS="4",
        NR_STATIONS="5",
        NR_WINDOWS="2",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    proc = _run(
        ["scaling", "--workload", "pipeline", "--version", "xla_v2",
         "--mesh-sizes", "8"],
        extra_env=env,
    )
    assert proc.returncode == 0, proc.stderr
    assert "MVis/s" in proc.stdout


def test_cli_sweep_stations_suffix(tmp_path):
    env = dict(SMALL_ENV, OUTPUT_PATH=str(tmp_path), NR_WINDOWS="2")
    proc = _run(
        ["sweep", "--workloads", "gridder", "--versions", "xla_v2",
         "--stations", "3"],
        extra_env=env,
    )
    assert proc.returncode == 0, proc.stderr
    assert list(tmp_path.glob("*gridder_xla_v2-tpu.csv"))


def test_cli_grid_stage_pallas(tmp_path):
    env = dict(SMALL_ENV, OUTPUT_PATH=str(tmp_path), NR_WINDOWS="2")
    proc = _run(["grid", "--method", "pallas"], extra_env=env)
    assert proc.returncode == 0, proc.stderr
    assert list(tmp_path.glob("*grid_add_pallas-tpu.csv"))


@pytest.mark.slow
def test_cli_grid_stage_ranges_and_extract(tmp_path):
    env = dict(SMALL_ENV, OUTPUT_PATH=str(tmp_path), NR_WINDOWS="2")
    proc = _run(["grid", "--method", "ranges"], extra_env=env)
    assert proc.returncode == 0, proc.stderr
    assert "range plan" in proc.stdout
    assert list(tmp_path.glob("*grid_add_ranges-tpu.csv"))
    proc = _run(["grid", "--direction", "to-subgrids", "--method", "ranges"],
                extra_env=env)
    assert proc.returncode == 0, proc.stderr
    assert list(tmp_path.glob("*grid_extract_ranges-tpu.csv"))
    # memory guard tripped -> per-stripe streamed extraction
    proc = _run(["grid", "--direction", "to-subgrids", "--method", "ranges",
                 "--suffix", "_str"],
                extra_env=dict(env, IDG_MAX_EXTRACT_BYTES="1",
                               NR_ITERATIONS="1"))
    assert proc.returncode == 0, proc.stderr
    assert "streamed per-stripe ranges" in proc.stdout
    assert list(tmp_path.glob("*grid_extract_ranges_str-tpu.csv"))


@pytest.mark.slow
def test_cli_pipeline_both_directions(tmp_path):
    env = dict(SMALL_ENV, OUTPUT_PATH=str(tmp_path), NR_WINDOWS="2")
    proc = _run(["pipeline", "--version", "xla_v2"], extra_env=env,
                timeout=600)
    assert proc.returncode == 0, proc.stderr
    assert "stage split" in proc.stdout
    assert list(tmp_path.glob("*pipeline_xla_v2-tpu.csv"))
    proc = _run(["pipeline", "--direction", "degrid"], extra_env=env,
                timeout=600)
    assert proc.returncode == 0, proc.stderr
    assert list(tmp_path.glob("*pipeline_degrid_pallas_*-tpu.csv"))


def test_cli_run_sustain(tmp_path):
    """--sustain S runs the sustained launch window (reference energy-loop
    semantics) and records sustained_ms + drift in the CSV."""
    env = dict(SMALL_ENV, OUTPUT_PATH=str(tmp_path), NR_WINDOWS="2")
    proc = _run(["run", "--workload", "gridder", "--version", "xla_v2",
                 "--sustain", "0.3"], extra_env=env)
    assert proc.returncode == 0, proc.stderr
    assert "sustained" in proc.stdout
    csv = next(tmp_path.glob("*gridder_xla_v2-tpu.csv")).read_text()
    assert "sustained_ms" in csv and "sustain_drift_pct" in csv


@pytest.mark.slow
def test_cli_pipeline_fused_default(tmp_path):
    """The grid-direction pipeline defaults to the fused-pieces kernel
    for pallas versions (SUBGRID_SIZE=16 satisfies the range-kernel
    P·N² % 1024 == 0 constraint); --no-fuse keeps the staged producer
    path. Both must produce a CSV through the cmd_pipeline wiring."""
    env = dict(SMALL_ENV, OUTPUT_PATH=str(tmp_path), NR_WINDOWS="2")
    proc = _run(["pipeline", "--version", "pallas_v6"], extra_env=env,
                timeout=600)
    assert proc.returncode == 0, proc.stderr
    assert "stage split" in proc.stdout
    assert list(tmp_path.glob("*pipeline_pallas_v6-tpu.csv"))
    proc = _run(["pipeline", "--version", "pallas_v6", "--no-fuse",
                 "--suffix", "_nofuse"], extra_env=env, timeout=600)
    assert proc.returncode == 0, proc.stderr
    assert list(tmp_path.glob("*pipeline_pallas_v6_nofuse-tpu.csv"))


@pytest.mark.slow
def test_cli_pipeline_fused_tile_path_rows_form(tmp_path):
    """Tile-path plans (nbp <= 2·S: stations=5 × timeslots=4 → S=40 ≥
    nbp/2 = 32 at grid 128/subgrid 16) engage the zero-copy row-form
    boundary (staged_gridder_pieces_runner pad_rows=..., kernel
    rows_out) — the fullsize default-problem path; SMALL_ENV's S=6 is
    sparse and takes the 4-D pieces branch instead."""
    env = dict(SMALL_ENV, NR_STATIONS="5", NR_TIMESLOTS="4",
               OUTPUT_PATH=str(tmp_path), NR_WINDOWS="2")
    proc = _run(["pipeline", "--version", "pallas_v6"], extra_env=env,
                timeout=600)
    assert proc.returncode == 0, proc.stderr
    assert list(tmp_path.glob("*pipeline_pallas_v6-tpu.csv"))


@pytest.mark.slow
def test_cli_pipeline_fused_odd_rowsize_falls_back(tmp_path):
    """SUBGRID_SIZE=12 → P·N² = 576, not a multiple of 1024: the pieces
    runner must decline (returning the staged_runner fallback) instead
    of crashing in subgrids_to_grid_ranges(tiles_pair=...)."""
    env = dict(SMALL_ENV, GRID_SIZE="96", SUBGRID_SIZE="12",
               OUTPUT_PATH=str(tmp_path), NR_WINDOWS="2")
    proc = _run(["pipeline", "--version", "pallas_v6"], extra_env=env,
                timeout=600)
    assert proc.returncode == 0, proc.stderr
    assert list(tmp_path.glob("*pipeline_pallas_v6-tpu.csv"))


@pytest.mark.slow
def test_cli_pipeline_degrid_chunked(tmp_path):
    """IDG_MAX_CHUNK below S engages the per-chunk extraction→degridder
    composition (sliced plans, one consumer per chunk)."""
    env = dict(SMALL_ENV, OUTPUT_PATH=str(tmp_path), NR_WINDOWS="2",
               IDG_MAX_CHUNK="4")
    proc = _run(["pipeline", "--direction", "degrid"], extra_env=env,
                timeout=600)
    assert proc.returncode == 0, proc.stderr
    assert "stage split" in proc.stdout
    assert list(tmp_path.glob("*pipeline_degrid_pallas_*-tpu.csv"))
    # the A/B flag restores the monolithic extraction + dynamic-slice path
    proc = _run(["pipeline", "--direction", "degrid", "--whole-extract",
                 "--suffix", "_whole"], extra_env=env, timeout=600)
    assert proc.returncode == 0, proc.stderr
    assert list(tmp_path.glob("*pipeline_degrid_pallas_*_whole-tpu.csv"))


def test_cli_scaling_pipeline_ranges():
    env = dict(
        SMALL_ENV,
        NR_TIMESLOTS="4",
        NR_STATIONS="5",
        NR_WINDOWS="2",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    proc = _run(
        ["scaling", "--workload", "pipeline", "--version", "xla_v2",
         "--mesh-sizes", "8", "--grid-method", "ranges"],
        extra_env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr
    assert "MVis/s" in proc.stdout


@pytest.mark.slow
def test_cli_scaling_pipeline_degrid():
    env = dict(
        SMALL_ENV,
        NR_TIMESLOTS="4",
        NR_STATIONS="5",
        NR_WINDOWS="2",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    for extra in ([], ["--grid-sharded"]):
        proc = _run(
            ["scaling", "--workload", "pipeline-degrid", "--version",
             "xla_v2", "--mesh-sizes", "8"] + extra,
            extra_env=env, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr
        # a measured row, not just the header ("skipped" rows have no %)
        assert "100.0%" in proc.stdout, proc.stdout
