"""Test env: run JAX on 8 virtual CPU devices so sharding tests work
anywhere (SURVEY.md §4: the standard JAX multi-device simulation)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
