"""Test configuration: force an 8-device CPU mesh before jax imports.

Tests exercise the multi-chip sharding paths on virtual CPU devices
(SURVEY.md section 4: the reference has no multi-host tests; we do).
"""

import os

# BLE_TPU_HW_TESTS=1 opts OUT of the CPU forcing so the *_tpu_hardware_*
# parity tests can exercise the real Mosaic lowering:
#   BLE_TPU_HW_TESTS=1 python -m pytest tests/test_pallas_gp_window.py \
#       -k hardware -q
_HW = os.environ.get("BLE_TPU_HW_TESTS") == "1"

if not _HW:
  os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if not _HW and "xla_force_host_platform_device_count" not in flags:
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

if not _HW:
  jax.config.update("jax_platforms", "cpu")
