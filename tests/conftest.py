"""Test env: force CPU jax with 8 virtual devices (multi-chip sharding tests
run on a host-device mesh; real-TPU behavior is exercised by bench.py)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the sandbox presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The sandbox's sitecustomize force-registers the axon TPU plugin and the
# env var alone does not stick -- the config API wins. Tests must run on the
# 8-device virtual CPU mesh, not the single real chip.
jax.config.update("jax_platforms", "cpu")

# this jax build defaults matmuls to bf16-grade precision even on CPU;
# tests compare against f64/f32 oracles, so pin f32
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    # donation is a TPU optimization; the CPU backend ignores it with a
    # warning per call
    config.addinivalue_line(
        "filterwarnings",
        "ignore:Some donated buffers were not usable:UserWarning")
