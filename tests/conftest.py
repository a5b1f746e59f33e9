"""Test config: run on a virtual 8-device local CPU mesh so pod-slice logic
is testable without TPUs (SURVEY.md §4 implication (d)).

The environment registers an `axon` remote-TPU backend via sitecustomize and
pins JAX_PLATFORMS=axon; eager ops there go through a remote-compile tunnel,
which is the wrong tool for a unit-test suite.  We override the platform to
local CPU *before* any backend is initialized.
"""

import os

# must land before the CPU client is created
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(12345)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
