"""Test configuration: run everything on a virtual 8-device CPU backend.

Must set XLA flags BEFORE jax initializes its backends (the standard JAX
fake-backend trick, SURVEY.md §4): tests never require real TPU hardware;
the driver's dryrun and bench exercise the TPU path separately.

NOTE: in this environment the ``axon`` TPU plugin ignores the
``JAX_PLATFORMS`` env var — ``JAX_PLATFORM_NAME`` and the config API are
the ones that stick, so both are set defensively.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the trainer-path tests compile full
# fwd+bwd train steps, which costs ~15s each on this host's single CPU
# core; repeat runs hit the cache and the suite stays fast.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       "/tmp/flownet2_jax_cache_tests"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU backend, got "
        f"{jax.default_backend()}"
    )
    assert len(jax.devices()) == 8


def pytest_collection_modifyitems(config, items):
    """Slow tests (TF interop, long training smokes) are opt-in: run them
    with RUN_SLOW=1 or an explicit -m filter. Keeps the default
    `pytest tests/ -x -q` loop fast."""
    if os.environ.get("RUN_SLOW") == "1":
        return
    if config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow: set RUN_SLOW=1 (or -m slow)")
    n_slow = 0
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
            n_slow += 1
    config._flownet2_n_slow_skipped = n_slow


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Make the slow-test contract visible: a default run that skipped
    the TF-interop parity proofs says so, so nobody believes they ran
    them when they did not (README 'Tests' section states the same)."""
    n = getattr(config, "_flownet2_n_slow_skipped", 0)
    if n:
        terminalreporter.write_line(
            f"NOTE: {n} slow tests (TF-interop parity, long training "
            "smokes) were skipped - set RUN_SLOW=1 to run them."
        )


@pytest.fixture
def rng():
    return np.random.RandomState(0)
