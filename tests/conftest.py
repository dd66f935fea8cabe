"""Test env: force an 8-device virtual CPU mesh before JAX import.

This simulates a TPU slice for sharding tests (SURVEY.md §4 test strategy)
and keeps the suite runnable on any machine.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override (host sets axon/TPU)
os.environ["ROBSEG_NO_CACHE"] = "1"  # no persistent XLA cache for CPU tests
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# Some TPU plugin environments ignore the JAX_PLATFORMS env var — force the
# platform through the config API as well (otherwise "CPU" tests silently
# run on the TPU tunnel).
jax.config.update("jax_platforms", "cpu")

# This environment's DEFAULT matmul/conv precision is bfloat16 (TPU-style)
# even on the CPU backend; parity tests against torch float32 need full f32.
jax.config.update("jax_default_matmul_precision", "float32")

assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---- session watchdog (VERDICT round-2 Weak #7) -------------------------
# One observed (unreproduced) wedge: a Pallas interpret-mode test sat in a
# futex wait for 40+ min with all threads idle, silently eating the run.
# Re-arm a faulthandler watchdog per test: if any single test exceeds the
# limit, dump EVERY thread's stack to stderr and hard-exit — a loud,
# diagnosable abort instead of a silent infinite hang. The limit is far
# above the slowest legitimate test (~5 min when the TPU tunnel hogs the
# core); only a true wedge trips it.
import faulthandler  # noqa: E402

_PER_TEST_TIMEOUT_S = 1500


def pytest_runtest_setup(item):
    faulthandler.dump_traceback_later(_PER_TEST_TIMEOUT_S, exit=True)


def pytest_runtest_teardown(item):
    faulthandler.cancel_dump_traceback_later()
