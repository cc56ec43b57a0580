"""Test configuration: force an 8-virtual-device CPU platform so sharding and
multi-chip code paths run on any host (the JAX analog of the reference's
world_size=1 SLURM fallback, ddp_utils.py:161-165). The real TPU chip is
reserved for bench.py — it is exclusive-access, so tests must never touch it.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A pytest plugin may already have imported jax; that is fine as long as no
# backend has been initialized yet — jax reads XLA_FLAGS and jax_platforms at
# first backend use, and config.update still applies post-import.
import jax

jax.config.update("jax_platforms", "cpu")
assert not sys.modules.get("jax")._src.xla_bridge._backends, (
    "a JAX backend was initialized before tests/conftest.py could pin CPU"
)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
