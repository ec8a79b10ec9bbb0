"""Test env: force the CPU backend with 8 virtual devices.

Per SURVEY.md §4: kernel-level unit tests run against numpy oracles and
multi-device tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count``), no TPU pod required.
Set FENIX_TESTS_TPU=1 to run on the real default backend instead.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

if os.environ.get("FENIX_TESTS_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
