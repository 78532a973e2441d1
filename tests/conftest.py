"""Test environment: run everything on CPU with 8 virtual devices.

Multi-chip sharding is tested on a virtual CPU mesh (the reference had no
multi-device capability to test at all); Pallas kernels run in interpret mode
on CPU. Env must be set before JAX initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The env var alone is not enough here: the machine's sitecustomize registers
# the TPU platform before pytest runs, so force the platform via jax.config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from idg_tpu import IDGParams, make_observation  # noqa: E402


@pytest.fixture(scope="session")
def small_params() -> IDGParams:
    """Shrunken problem in the spirit of correctness mode, sized for fast
    CPU/interpret-mode runs."""
    return IDGParams(
        grid_size=128,
        subgrid_size=16,
        nr_stations=3,
        nr_timeslots=2,
        nr_timesteps_subgrid=16,
        nr_channels=8,
    )


@pytest.fixture(scope="session")
def small_obs(small_params):
    obs, _ = make_observation(small_params)
    return obs


@pytest.fixture(scope="session")
def ref_params() -> IDGParams:
    """The reference's exact correctness-mode defaults
    (tests/gridder_common.cpp:54-64): 2 stations, 2 timeslots -> 2 subgrids,
    128 timesteps, 16 channels, 32x32 subgrids."""
    return IDGParams(
        grid_size=1024,
        subgrid_size=32,
        nr_stations=2,
        nr_timeslots=2,
        nr_timesteps_subgrid=128,
        nr_channels=16,
    )


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(1234)
