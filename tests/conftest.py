"""Test env: 8 virtual CPU devices so sharding tests run anywhere
(SURVEY.md §4: the standard JAX multi-device simulation).

The container boots with a TPU PJRT plugin force-registered from
sitecustomize (JAX_PLATFORMS=axon); that registration cannot be undone
in-process, so if the environment isn't CPU-clean we re-exec pytest once
with the corrected environment (restoring pytest's captured fds first).
"""
import os
import sys


def _env_ok() -> bool:
    if os.environ.get("JAX_PLATFORMS") != "cpu":
        return False
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False
    flags = os.environ.get("XLA_FLAGS", "")
    return "xla_force_host_platform_device_count" in flags


def pytest_configure(config):
    if _env_ok():
        return
    if os.environ.get("_PCLEAN_TEST_REEXEC") == "1":
        raise RuntimeError("test environment re-exec failed to take effect")
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # disables the TPU plugin bootstrap
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["_PCLEAN_TEST_REEXEC"] = "1"
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]],
               env)
