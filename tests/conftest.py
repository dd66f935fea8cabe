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
# diagnosable abort instead of a silent infinite hang. Round-5 lesson: the
# limit must track the HOST, not the test — on a 1-core box the f64 CPU
# compile inside test_reference_sea_pipeline_diff legitimately exceeds the
# old 1500 s (XLA constant-folds the f64 head weights single-threaded),
# and the watchdog's hard-exit looked like a silent pytest death in -q
# captured mode. Overridable per run via ROBSEG_TEST_TIMEOUT_S; the
# kernel-test subprocess children keep the tighter 1500 s (set below).
import faulthandler  # noqa: E402

_PER_TEST_TIMEOUT_S = int(os.environ.get("ROBSEG_TEST_TIMEOUT_S", "3600"))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "timeout_s(n): per-test faulthandler watchdog override (seconds) — "
        "for tests whose legitimate runtime is host-dependent (e.g. the f64"
        " CPU compile in the SEA driver diff takes >1h on a 1-core box)")


def pytest_runtest_setup(item):
    m = item.get_closest_marker("timeout_s")
    limit = int(m.args[0]) if m else _PER_TEST_TIMEOUT_S
    faulthandler.dump_traceback_later(limit, exit=True)


def pytest_runtest_teardown(item):
    faulthandler.cancel_dump_traceback_later()


# ---- subprocess isolation for Pallas interpret-mode tests ----------------
# (VERDICT round-2 Weak #7 / round-3 hardening.) Two failure classes were
# observed ONLY around tests/test_kernels.py in full-suite runs, never in
# isolation: a 40-min futex wedge (round 2) and a silent process death with
# no traceback (round 3, suspected SIGILL from a mismatched-CPU-feature AOT
# artifact — the cpu_aot_loader warns exactly that). Neither is catchable
# in-process, so each kernel test runs in a fresh subprocess: a crash or
# hang becomes a loud, attributed FAILURE instead of eating the whole run.
# Disable with ROBSEG_ISOLATE_KERNEL_TESTS=0 (e.g. when debugging a single
# test interactively).
_ISOLATE_FILES = ("test_kernels.py",)


def pytest_runtest_protocol(item, nextitem):
    import os as _os
    if _os.environ.get("ROBSEG_ISOLATED_CHILD"):
        return None
    if _os.environ.get("ROBSEG_ISOLATE_KERNEL_TESTS", "1") == "0":
        return None
    if not str(item.fspath).endswith(_ISOLATE_FILES):
        return None
    import subprocess
    import sys
    import time
    from _pytest.reports import TestReport

    hook = item.ihook
    hook.pytest_runtest_logstart(nodeid=item.nodeid, location=item.location)
    t0 = time.time()
    env = {**_os.environ, "ROBSEG_ISOLATED_CHILD": "1",
           # children run single short kernel tests: keep the tight watchdog
           "ROBSEG_TEST_TIMEOUT_S": "1500"}
    # the kernel tests use no mesh: run the child single-device. The
    # recurring in-suite wedge (round-2 futex hang; two round-3 in-suite
    # timeouts of a test that passes standalone in ~60 s) is suspected to
    # be interpret-mode io_callbacks deadlocking against 8 concurrent
    # virtual-device execution streams on the single core.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    try:
        # parent timeout ABOVE the child's 1500 s faulthandler watchdog so
        # a wedged child dumps its thread stacks before the parent kills it
        p = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x", item.nodeid],
            capture_output=True, text=True, timeout=1700, env=env,
            cwd=str(item.config.rootpath))
        rc, out = p.returncode, (p.stdout or "") + (p.stderr or "")
    except subprocess.TimeoutExpired as e:
        rc = -1
        out = (f"ISOLATED TEST TIMED OUT after 1700s\n"
               f"{(e.stdout or b'').decode(errors='replace')[-4000:]}")
    # distinguish a child that SKIPPED from one that passed (rc==0 both
    # ways): parse pytest's summary line for "N skipped" with no passes
    import re
    skipped = bool(re.search(r"\b[1-9]\d* skipped\b", out)) and not \
        re.search(r"\b[1-9]\d* passed\b", out)
    if rc == 0 and skipped:
        outcome, longrepr = "skipped", (
            str(item.fspath), item.location[1] or 0,
            "skipped in isolated child (see child output)")
    elif rc == 0:
        outcome, longrepr = "passed", None
    else:
        outcome = "failed"
        longrepr = (f"isolated subprocess exited rc={rc}\n"
                    f"--- child output ---\n" + out[-6000:])
    # emit the full setup/call/teardown report triple so reporting
    # plugins see a well-formed protocol for the isolated test
    for when in ("setup", "call", "teardown"):
        rep = TestReport(
            nodeid=item.nodeid, location=item.location,
            keywords={item.name: 1},
            outcome=outcome if when == "call" else "passed",
            longrepr=longrepr if when == "call" else None, when=when,
            sections=[], duration=time.time() - t0 if when == "call" else 0.0,
            user_properties=[])
        hook.pytest_runtest_logreport(report=rep)
    hook.pytest_runtest_logfinish(nodeid=item.nodeid, location=item.location)
    return True
