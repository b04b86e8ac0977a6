"""Test configuration: force an 8-device CPU mesh before jax imports.

Tests exercise the multi-chip sharding paths on virtual CPU devices
(SURVEY.md section 4: the reference has no multi-host tests; we do).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache keeps repeated test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ble_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# Force CPU via jax.config as well: the container's sitecustomize imports
# jax at interpreter startup (registering a remote-TPU PJRT plugin), so
# environment variables alone are read too late. Eager per-op dispatch over
# the TPU tunnel is a network round-trip; tests must run on local CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
