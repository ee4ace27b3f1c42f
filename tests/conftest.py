"""Test configuration: run everything on a virtual 8-device CPU backend.

Must set XLA flags BEFORE jax initializes its backends (the standard JAX
fake-backend trick, SURVEY.md §4): tests never require real TPU hardware;
the driver's dryrun and bench exercise the TPU path separately.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
