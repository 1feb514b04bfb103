"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic (sharded kNN merge, all-gathered contrastive loss)
is tested without TPUs by splitting the host CPU into 8 XLA devices — the
"fake backend" the reference never needed (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin force-registers itself regardless of JAX_PLATFORMS;
# the config update is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
