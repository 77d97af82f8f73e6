"""Test configuration: force a fast 8-device virtual CPU mesh.

Tests never need real TPU hardware; multi-chip sharding is validated on a
host-platform device mesh (the driver separately dry-runs the real multichip
path via __graft_entry__.dryrun_multichip).

The container boots every Python interpreter through an axon TPU relay shim
(sitecustomize) whose grant handshake costs ~2.5 minutes per process. The
shim is armed by PALLAS_AXON_POOL_IPS before any of our code runs, so the
test suite escapes it by re-exec'ing pytest once with the axon boot disabled
and JAX pinned to CPU (pytest's output capture is stopped first so the
re-exec'd run writes to the real stdout).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def _needs_reexec():
    return (
        os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("_SOURCE_TPU_TEST_REEXEC") != "1"
    )


def pytest_configure(config):
    if not _needs_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["_SOURCE_TPU_TEST_REEXEC"] = "1"
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *config.invocation_params.args],
        env,
    )
