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
# Persistent XLA compile cache: the suite compiles many large unrolled
# LDPC/polar/slot programs; cold runs are compile-bound, warm runs fast.
# Dedicated directory: sharing a cache with axon-hooked processes mixes
# entries compiled with different machine features (SIGILL on load).
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache_tests")
os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


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
