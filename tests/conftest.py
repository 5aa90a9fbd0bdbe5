"""Test session config: force the CPU backend with 8 virtual devices.

The dev box exposes one real TPU chip through a slow tunnel; tests run on
CPU (fast compiles) and validate multi-chip sharding on a virtual
8-device mesh. `jax.config.update` is required in addition to the env
vars because the axon plugin registers itself at interpreter start.
"""

import os

# Disable the persistent JAX compile cache for tests (see
# core.enable_compile_cache): it exists for the slow TPU tunnel, and
# under pytest it only adds cross-process hazards — concurrent pytest
# runs write the same directory, and entries AOT-compiled in another
# container have crashed the executable serializer mid-suite. Must be
# set before any soundscope_tpu import. An explicit opt-in wins.
os.environ.setdefault("SS_COMPILE_CACHE", "")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound accumulated compiled-executable state.

    Running the whole suite in one process eventually segfaults XLA:CPU
    *during a compile* (observed repeatedly at the last interpret-mode
    Pallas test of tests/test_pallas_iir.py after ~90-110 prior tests;
    the same tests pass in any half-sized subset, so no single test is
    the trigger — it is cumulative process state). Dropping the jit
    caches between modules keeps the live-executable population small.
    Compiles on the CPU backend are cheap, so re-tracing costs seconds.
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
