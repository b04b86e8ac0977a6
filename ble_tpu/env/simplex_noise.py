"""4-D gradient (simplex) noise, stateless and fully vectorized.

The reference perturbs wind forecasts with OpenSimplex 4-D noise evaluated
point-by-point through a Python extension (``env/simplex_wind_noise.py``,
SURVEY.md 2.2). OpenSimplex's lattice traversal is irregular and hostile
to SIMD, so this module implements classic Gustavson 4-D simplex noise
instead: skew -> rank-order the in-cell coordinates -> five corner
contributions, with corner gradients produced by a stateless integer hash
of (cell coords, seed). Identical seeds give identical fields; the
harmonic structure, random per-reset grid offsets, and variance
renormalization of the reference are preserved (constants from
simplex_wind_noise.py:50-76), with the raw-noise variance constant
measured for THIS noise function.
"""

import math

import jax.numpy as jnp

# Skew factors for 4-D simplex noise.
_F4 = (math.sqrt(5.0) - 1.0) / 4.0
_G4 = (5.0 - math.sqrt(5.0)) / 20.0

# 32 gradient directions: all (0, +-1, +-1, +-1) permutations.
_GRAD4 = []
for zero_dim in range(4):
  for signs in range(8):
    g = []
    bit = 0
    for d in range(4):
      if d == zero_dim:
        g.append(0.0)
      else:
        g.append(1.0 if (signs >> bit) & 1 else -1.0)
        bit += 1
    _GRAD4.append(g)
_GRAD4 = jnp.asarray(_GRAD4, jnp.float32)  # (32, 4)

# Harmonic tables (weight, x/y/pressure/time spacing), reference
# simplex_wind_noise.py:50-64.
U_HARMONICS = (
    (0.1445, 702.269, 2116.987, 2587.802, 245.0),
    (0.2766, 1483.570, 752.124, 646.208, 16.39),
    (0.2627, 276.810, 147.040, 587.702, 3.836),
    (0.2137, 10214.525, 1512.216, 965.629, 41.780),
    (0.1025, 181.286, 420.942, 8500.0, 245.0),
)
V_HARMONICS = (
    (0.2716, 1974.228, 2028.814, 713.697, 26.435),
    (0.2684, 699.738, 541.845, 632.116, 9.530),
    (0.2348, 217.750, 196.522, 686.825, 3.546),
    (0.1186, 47.500, 43.048, 66.553, 8.424),
    (0.1066, 3663.291, 232.023, 7499.741, 225.0),
)

# Empirical variance of a single `simplex4d` harmonic over random inputs
# (measured once, see tests/test_simplex_noise.py); plays the role of
# OPENSIMPLEX_VARIANCE = 0.0569 in the reference's magnitude calibration
# (simplex_wind_noise.py:69-76).
RAW_VARIANCE = 0.0884
TARGET_BLEND_VARIANCE = 1.02
NOISE_MAGNITUDE = math.sqrt(TARGET_BLEND_VARIANCE / RAW_VARIANCE)


def _hash_gradient_index(ix, iy, iz, iw, seed):
  """Stateless avalanche hash of 4 lattice coords + seed -> [0, 32)."""
  h = seed.astype(jnp.uint32)
  for c, mult in ((ix, 0x9E3779B1), (iy, 0x85EBCA77), (iz, 0xC2B2AE3D),
                  (iw, 0x27D4EB2F)):
    h = h ^ (c.astype(jnp.uint32) * jnp.uint32(mult))
    h = h * jnp.uint32(0x85EBCA77)
    h = h ^ (h >> 13)
  h = h * jnp.uint32(0xC2B2AE3D)
  h = h ^ (h >> 16)
  return (h & jnp.uint32(31)).astype(jnp.int32)


def simplex4d(x, y, z, w, seed):
  """4-D simplex noise; inputs broadcast, `seed` int32. Output ~[-1, 1]."""
  coords = jnp.stack(jnp.broadcast_arrays(
      jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
      jnp.asarray(z, jnp.float32), jnp.asarray(w, jnp.float32)), axis=-1)

  s = jnp.sum(coords, axis=-1, keepdims=True) * _F4
  cell = jnp.floor(coords + s)  # (..., 4)
  t = jnp.sum(cell, axis=-1, keepdims=True) * _G4
  origin = cell - t
  d0 = coords - origin  # Distances from the cell origin.

  # Rank each coordinate of d0 among the four (3 = largest). Ties broken by
  # index order via strict/non-strict comparison split.
  di = d0[..., :, None]
  dj = d0[..., None, :]
  gt = (di > dj).astype(jnp.int32)
  ge = (di >= dj).astype(jnp.int32)
  upper = jnp.triu(jnp.ones((4, 4), jnp.int32), k=1)
  lower = jnp.tril(jnp.ones((4, 4), jnp.int32), k=-1)
  rank = jnp.sum(gt * lower + ge * upper, axis=-1)  # (..., 4) in [0, 3]

  cell_i = cell.astype(jnp.int32)
  seed = jnp.asarray(seed, jnp.int32)

  total = jnp.zeros(coords.shape[:-1], jnp.float32)
  for corner in range(5):
    if corner == 0:
      offs = jnp.zeros_like(rank)
    else:
      offs = (rank >= (4 - corner)).astype(jnp.int32)
    d = d0 - offs.astype(jnp.float32) + corner * _G4
    tt = 0.6 - jnp.sum(d * d, axis=-1)
    tt = jnp.maximum(tt, 0.0)
    gi = _hash_gradient_index(cell_i[..., 0] + offs[..., 0],
                              cell_i[..., 1] + offs[..., 1],
                              cell_i[..., 2] + offs[..., 2],
                              cell_i[..., 3] + offs[..., 3], seed)
    # grad . d computed branchlessly from the index bits -- _GRAD4[gi]
    # is a batched-index gather, which XLA:TPU lowers to serialized
    # selects (the same anti-pattern replaced by one-hot contractions
    # elsewhere in this repo). _GRAD4[i] has component d equal to 0 when
    # d == i>>3, else +-1 by bit (d adjusted past the zero dim) of i&7.
    zero_dim = gi >> 3
    signs = gi & 7
    dot = jnp.zeros_like(total)
    for dim in range(4):
      bit = jnp.where(dim < zero_dim, dim, dim - 1)
      sign = 2.0 * ((signs >> bit) & 1).astype(jnp.float32) - 1.0
      dot = dot + jnp.where(dim == zero_dim, 0.0, sign * d[..., dim])
    total = total + tt ** 4 * dot
  return 27.0 * total


def _tables(harmonics):
  import numpy as np
  arr = np.asarray(harmonics, np.float32)  # (5, 5): w, xs, ys, ps, ts.
  return jnp.asarray(arr[:, 0]), jnp.asarray(arr[:, 1:])


_UV_WEIGHTS, _UV_SPACINGS = (lambda u, v: (
    jnp.stack([u[0], v[0]]),  # (2, 5)
    jnp.stack([u[1], v[1]])))(  # (2, 5, 4)
        _tables(U_HARMONICS), _tables(V_HARMONICS))


def uv_noise(x_km, y_km, pressure_pa, time_hours, seeds, offsets):
  """Both wind components' blended noise in ONE batched simplex call.

  Args:
    x_km, y_km, pressure_pa, time_hours: query coordinates, shape S
      (broadcastable).
    seeds: (2, 5) int32 per (component, harmonic).
    offsets: (2, 5, 4) float32 grid translations.

  Returns:
    (u_noise, v_noise), each of shape S. Equivalent to per-harmonic
    `harmonic_noise` but with a (2, 5) leading lattice axis so the TPU
    sees ~10x fewer (tiny) kernels.
  """
  coords = jnp.stack(jnp.broadcast_arrays(
      jnp.asarray(x_km, jnp.float32), jnp.asarray(y_km, jnp.float32),
      jnp.asarray(pressure_pa, jnp.float32),
      jnp.asarray(time_hours, jnp.float32)), axis=-1)  # S + (4,)
  sp = _UV_SPACINGS.reshape((2, 5) + (1,) * (coords.ndim - 1) + (4,))
  off = offsets.reshape((2, 5) + (1,) * (coords.ndim - 1) + (4,))
  p = coords / sp + off  # (2, 5) + S + (4,)
  seeds_b = seeds.reshape((2, 5) + (1,) * (coords.ndim - 1))
  noise = NOISE_MAGNITUDE * simplex4d(p[..., 0], p[..., 1], p[..., 2],
                                      p[..., 3], seeds_b)  # (2, 5) + S
  w = _UV_WEIGHTS.reshape((2, 5) + (1,) * (coords.ndim - 1))
  total_w = jnp.sum(_UV_WEIGHTS, axis=1)  # (2,)
  total_w2 = jnp.sum(_UV_WEIGHTS ** 2, axis=1)
  blend = jnp.sum(noise * w, axis=1)  # (2,) + S
  scale = (jnp.sqrt(total_w / total_w2) / total_w).reshape(
      (2,) + (1,) * (coords.ndim - 1))
  blend = blend * scale
  return blend[0], blend[1]


def uv_noise_exact(x_km, y_km, pressure_pa, time_hours, perms, offsets):
  """`uv_noise` with bit-faithful OpenSimplex 4-D noise (parity mode).

  Same harmonic structure, but each (component, harmonic) lattice is the
  reference's seeded OpenSimplex permutation table instead of the stateless
  hash -- with the same perm tables the reference pipeline (via the
  opensimplex shim) and this function produce IDENTICAL noise, closing
  SURVEY.md hard-part 2. Slower than `uv_noise` (256-candidate superset
  sum + perm-chain gathers); the training path keeps the hash noise.

  Args:
    x_km, y_km, pressure_pa, time_hours: query coordinates, shape S.
    perms: (2, 5, 256) int32 permutation tables from
      `opensimplex4d.perm_from_seed` per (component, harmonic).
    offsets: (2, 5, 4) grid translations (reference
      simplex_wind_noise.py:108-114).

  Returns:
    (u_noise, v_noise), each of shape S.
  """
  from ble_tpu.env import opensimplex4d
  # The reference's calibration constant for TRUE OpenSimplex noise
  # (simplex_wind_noise.py:69-76), not this module's hash-noise variance.
  magnitude = math.sqrt(TARGET_BLEND_VARIANCE / 0.0569)
  dtype = jnp.result_type(float)
  coords = jnp.stack(jnp.broadcast_arrays(
      jnp.asarray(x_km, dtype), jnp.asarray(y_km, dtype),
      jnp.asarray(pressure_pa, dtype),
      jnp.asarray(time_hours, dtype)), axis=-1)  # S + (4,)
  batch_ndim = coords.ndim - 1
  sp = _UV_SPACINGS.astype(dtype).reshape((2, 5) + (1,) * batch_ndim + (4,))
  off = jnp.asarray(offsets, dtype).reshape(
      (2, 5) + (1,) * batch_ndim + (4,))
  p = coords / sp + off  # (2, 5) + S + (4,)
  perm_b = jnp.asarray(perms, jnp.int32).reshape(
      (2, 5) + (1,) * batch_ndim + (256,))
  noise = magnitude * opensimplex4d.noise4d(
      perm_b, p[..., 0], p[..., 1], p[..., 2], p[..., 3])  # (2, 5) + S
  w = _UV_WEIGHTS.astype(dtype).reshape((2, 5) + (1,) * batch_ndim)
  total_w = jnp.sum(_UV_WEIGHTS, axis=1)  # (2,)
  total_w2 = jnp.sum(_UV_WEIGHTS ** 2, axis=1)
  blend = jnp.sum(noise * w, axis=1)  # (2,) + S
  scale = (jnp.sqrt(total_w / total_w2) / total_w).astype(dtype).reshape(
      (2,) + (1,) * batch_ndim)
  blend = blend * scale
  return blend[0], blend[1]


def harmonic_noise(x_km, y_km, pressure_pa, time_hours, seeds, offsets,
                   harmonics):
  """Weighted multi-harmonic noise for one wind component.

  Args:
    x_km, y_km, pressure_pa, time_hours: query coordinates (broadcastable).
    seeds: (5,) int32 per-harmonic hash seeds.
    offsets: (5, 4) float32 per-harmonic grid translations in [-1, 1]
      (reference simplex_wind_noise.py:108-114).
    harmonics: one of U_HARMONICS / V_HARMONICS.

  Returns:
    Blended noise [m/s] matching the reference's variance calibration
    (simplex_wind_noise.py:195-209).
  """
  weighted = 0.0
  total_weight = 0.0
  total_weight_sq = 0.0
  for h, (weight, xs, ys, ps, ts) in enumerate(harmonics):
    noise = NOISE_MAGNITUDE * simplex4d(
        x_km / xs + offsets[h, 0],
        y_km / ys + offsets[h, 1],
        pressure_pa / ps + offsets[h, 2],
        time_hours / ts + offsets[h, 3],
        seeds[h])
    weighted = weighted + noise * weight
    total_weight += weight
    total_weight_sq += weight ** 2
  weighted = weighted / total_weight
  return weighted * math.sqrt(total_weight / total_weight_sq)
