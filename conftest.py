# Root conftest: force JAX onto a virtual multi-device CPU platform for tests.
# Must run before anything imports jax (pytest imports conftest first).
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
