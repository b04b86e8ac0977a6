"""opensimplex shim: the `OpenSimplex(seed).noise4d(x, y, z, w)` API.

Delegates to ble_tpu's own stateless 4-D simplex noise
(ble_tpu/env/simplex_noise.py). This is a STATISTICAL stand-in, not a
bit-for-bit OpenSimplex port: the output is rescaled so its variance over
random inputs equals the OpenSimplex variance the reference calibrated
against (reference env/simplex_wind_noise.py:68-77, OPENSIMPLEX_VARIANCE =
0.0569), which keeps the reference's NOISE_MAGNITUDE = sqrt(1.02/0.0569)
calibration exact. Spatial/temporal correlation lengths are set by the
harmonic spacings (identical on both sides), so the reference pipeline
running on this shim produces wind noise with the same second-order
statistics as with the real library — quantified in
tests/test_reference_parity.py::test_noise_statistics.

Batched evaluation: noise4d accepts numpy arrays as well as scalars (the
real opensimplex 0.3 is scalar-only; arrays keep the parity eval fast).
"""

import math

import jax
import numpy as np

from ble_tpu.env import simplex_noise

# Rescale this implementation's raw variance (reference
# simplex_wind_noise.py:68 "kRawVariance" = 0.088392, matching
# ble_tpu.env.simplex_noise.RAW_VARIANCE) to OpenSimplex's.
_SCALE = math.sqrt(0.0569 / simplex_noise.RAW_VARIANCE)


@jax.jit
def _noise4(x, y, z, w, seed):
  return simplex_noise.simplex4d(x, y, z, w, seed) * _SCALE


class OpenSimplex:

  def __init__(self, seed: int = 0):
    # simplex4d folds the seed through a 32-bit avalanche hash; any
    # int64 seed value is usable after masking.
    self._seed = np.int32(np.uint64(seed) & np.uint64(0x7FFFFFFF))

  def noise4d(self, x, y, z, w):
    out = _noise4(np.float32(x), np.float32(y), np.float32(z),
                  np.float32(w), self._seed)
    arr = np.asarray(out)
    return float(arr) if arr.ndim == 0 else arr

  # opensimplex >= 0.4 renamed noise4d -> noise4; accept both.
  noise4 = noise4d
