"""Test config: force CPU JAX with 8 virtual devices (the ddp_sim equivalent —
reference configs/trainer/ddp_sim.yaml simulated DDP with 2 CPU procs; we
simulate an 8-chip mesh in one process).

The ambient environment registers the TPU ('axon') PJRT plugin at interpreter
start via sitecustomize, so plain JAX_PLATFORMS env handling is too late —
we must update jax.config before any backend initialization.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _check_cpu():
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"
