"""Test configuration: run everything on a virtual 8-device CPU mesh.

The real chip is reserved for bench.py; unit tests must be hermetic and
exercise the multi-device code paths, so we force the CPU platform with
8 virtual devices (SURVEY.md §5 TPU-equivalent test strategy).

Note: the axon TPU plugin (sitecustomize) force-sets
``jax_platforms="axon,cpu"`` via jax.config, so the JAX_PLATFORMS env
var alone is NOT enough — we must override through jax.config.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)


@pytest.fixture(scope="session", autouse=True)
def _verify_cpu():
    assert jax.devices()[0].platform == "cpu"
    assert jax.device_count() == 8
