"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
imports, so mesh/sharding tests run without TPU hardware (SURVEY.md §4d)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's axon TPU plugin force-prepends itself to jax_platforms;
# config.update after import is the reliable way to pin tests to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
