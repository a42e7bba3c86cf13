"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on fake host-platform devices, the standard
JAX substitute for real pod slices (SURVEY.md §4). The axon sitecustomize in
this image force-registers the TPU backend in every interpreter, so we must
override via jax.config (env vars alone are ignored) before any backend is
initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
