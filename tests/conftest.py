"""Test configuration: force an 8-virtual-device CPU platform.

Tests must run without TPU hardware; sharding tests use a fake 8-device mesh
(jax.sharding.Mesh over CPU devices), standing in for multi-chip runs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Belt and braces: a pytest plugin may import jax before this conftest runs,
# in which case the env var alone is too late (the backend is chosen lazily,
# so the config update below still lands before initialization).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
