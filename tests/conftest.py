"""Test configuration: 8-device virtual CPU mesh, no TPU tunnel.

Real TPU hardware is single-chip in this environment; multi-chip sharding is
validated on virtual CPU devices exactly as the driver's dryrun does.

The container's sitecustomize registers an 'axon' PJRT plugin whose
remote-compile relay slows *CPU* XLA compiles ~20x.  Tests are CPU-only, so
if the hook is active we re-exec the interpreter once with it disabled
(from pytest_configure, after restoring pytest's captured stdio fds).
"""

import os
import sys

_NEEDS_REEXEC = bool(os.environ.get("PALLAS_AXON_POOL_IPS")) and not os.environ.get(
    "_SRSRAN_TPU_TEST_REEXEC")

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# NOTE: no persistent XLA compile cache.  On this host, deserializing
# cached CPU executables intermittently segfaults inside
# compilation_cache.get_executable_and_time (machine-feature mismatch in
# the AOT loader: entries record +prefer-no-scatter/+prefer-no-gather that
# the loading process rejects).  Cold compiles cost ~9 min for the full
# suite but are reliable.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables at module boundaries.

    The full suite compiles hundreds of XLA:CPU programs in one process;
    past ~140 tests a further compile segfaults inside
    backend_compile_and_load (accumulated JIT state; reproducible at
    test_pusch_two_layers when the whole suite runs in order, while any
    half of the suite passes).  Dropping the executable caches between
    modules keeps the process comfortably below the cliff.
    """
    yield
    import jax
    jax.clear_caches()


def pytest_configure(config):
    if not _NEEDS_REEXEC:
        return
    capman = config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    env = dict(os.environ)
    env["_SRSRAN_TPU_TEST_REEXEC"] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PALLAS_AXON_REMOTE_COMPILE"] = "0"
    sys.stdout.flush()
    sys.stderr.flush()
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
