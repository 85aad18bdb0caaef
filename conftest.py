"""Root pytest conftest: pin the unit-test suite to a virtual 8-device CPU
platform.

The ambient environment registers a remote-TPU PJRT plugin in every Python
interpreter (via sitecustomize on PYTHONPATH) and pins JAX_PLATFORMS to it.
Unit tests would then run every op over a network tunnel — or hang. Those knobs
are read when the interpreter boots, so they cannot be fixed from inside this
process: re-exec pytest once with a cleaned environment instead.

The re-exec happens in pytest_configure with output capture suspended, because
pytest captures fd 1/2 before conftest import — exec'ing while captured would
send the child's output into a discarded temp file.

Hardware benchmarks (bench.py) intentionally do NOT go through this path and
use the real TPU.
"""

import os
import sys

_CLEAN_MARKER = "_ULTRA_TPU_TEST_REEXEC"


def _needs_reexec() -> bool:
    if os.environ.get(_CLEAN_MARKER):
        return False
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True
    return os.environ.get("JAX_PLATFORMS", "cpu") not in ("", "cpu")


def pytest_configure(config):
    if not _needs_reexec():
        return
    env = dict(os.environ)
    env[_CLEAN_MARKER] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    capman = config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()

    args = list(config.invocation_params.args)
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest", *args], env)
