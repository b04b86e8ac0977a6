"""opensimplex shim: the `OpenSimplex(seed).noise4d(x, y, z, w)` API.

A from-scratch OpenSimplex 4-D implementation (ble_tpu/env/opensimplex4d.py):
the same seed -> 64-bit-LCG Fisher-Yates permutation table, gradient set,
lattice and attn^4 kernel as the original algorithm, evaluated here through
the independent float64 numpy path. With it, the reference pipeline
(env/simplex_wind_noise.py) running inside this container produces REAL
OpenSimplex-class noise, and ble_tpu's parity noise mode reproduces it
bit-for-bit from the same seeds (tests/test_opensimplex4d.py).

The pip `opensimplex` package cannot be installed in this container (zero
egress), so equality against that exact binary is unverifiable here; the
raw variance of this implementation over random inputs is ~0.057, matching
the reference's calibrated OPENSIMPLEX_VARIANCE = 0.0569
(simplex_wind_noise.py:69) without any rescaling.

Batched evaluation: noise4d accepts numpy arrays as well as scalars (the
real opensimplex 0.3 is scalar-only; arrays keep the parity eval fast).
"""

import numpy as np

from ble_tpu.env import opensimplex4d


class OpenSimplex:

  def __init__(self, seed: int = 0):
    self._perm = opensimplex4d.cached_perm(seed)

  def noise4d(self, x, y, z, w):
    out = opensimplex4d.noise4d_np(self._perm, x, y, z, w)
    arr = np.asarray(out)
    return float(arr) if arr.ndim == 0 else arr

  # opensimplex >= 0.4 renamed noise4d -> noise4; accept both.
  noise4 = noise4d
