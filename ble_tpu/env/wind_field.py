"""Wind fields: device-resident 4-D grids + procedural noise.

Re-design of the reference wind stack (``env/wind_field.py``,
``env/grid_based_wind_field.py``, ``env/generative_wind_field.py``):

  - A wind field is DATA, not an object: `WindFieldState` holds the decoded
    (21, 21, 10, 9, 2) forecast grid and the noise parameters, all pytree
    leaves, so each vectorized env carries its own field.
  - `get_forecast` is quadrilinear interpolation (ops/interp.py) with
    edge clamping and the 48-h time "boomerang"
    (grid_based_wind_field.py:134-186).
  - `get_ground_truth` adds two-component five-harmonic simplex noise
    (wind_field.py:125-145).

Field samplers (VAE decode / procedural test fields) live in callers; this
module is pure lookup math.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ble_tpu.env import simplex_noise

# FieldShape constants (reference generative/vae.py:27-44).
LATLNG_SLICES = 21
PRESSURE_SLICES = 10
TIME_SLICES = 9
LATLNG_DISPLACEMENT_KM = 500.0
MIN_PRESSURE_PA = 5000.0
MAX_PRESSURE_PA = 14000.0
TIME_HORIZON_HOURS = 48.0

GRID_SHAPE = (LATLNG_SLICES, LATLNG_SLICES, PRESSURE_SLICES, TIME_SLICES, 2)

_AXES = (
    jnp.linspace(-LATLNG_DISPLACEMENT_KM, LATLNG_DISPLACEMENT_KM,
                 LATLNG_SLICES),
    jnp.linspace(-LATLNG_DISPLACEMENT_KM, LATLNG_DISPLACEMENT_KM,
                 LATLNG_SLICES),
    jnp.linspace(MIN_PRESSURE_PA, MAX_PRESSURE_PA, PRESSURE_SLICES),
    jnp.linspace(0.0, TIME_HORIZON_HOURS, TIME_SLICES),
)


# Storage dtype for the forecast grid. bfloat16 halves the step's single
# largest HBM stream (the 650 MB-at-4096-envs field read in
# effective_column; contraction still accumulates in f32). The grid is a
# VAE SAMPLE with +-1 m/s simplex noise added on top of every lookup, so
# bf16's ~0.4% relative error (~0.06 m/s at typical wind speeds) is far
# below the field's own modeling error. Set to jnp.float32 for bit-level
# oracle comparisons.
FIELD_DTYPE = jnp.bfloat16


@struct.dataclass
class WindFieldState:
  """Per-episode wind field: forecast grid + noise parameters."""
  field: jnp.ndarray  # (21, 21, 10, 9, 2) FIELD_DTYPE, [u, v] in m/s.
  noise_seeds: jnp.ndarray  # (2, 5) int32: per (component, harmonic).
  noise_offsets: jnp.ndarray  # (2, 5, 4) float32 in [-1, 1].
  # Parity mode (None on the fast path): (2, 5, 256) int32 OpenSimplex
  # permutation tables; when present, get_noise evaluates bit-faithful
  # OpenSimplex 4-D noise instead of the hash-lattice noise.
  noise_perms: Optional[jnp.ndarray] = None
  # Windowed slab cache (None = read the full grid every query). The step
  # only ever queries the field at the balloon, which moves <=2 km/step vs
  # the 50 km lat/lng grid spacing -- so `effective_column` reading all
  # 155 KiB of the (bf16) grid per env per step is the single largest HBM
  # stream of the whole env step (docs/benchmarks.md roofline). The slab
  # caches the (SLAB_W, SLAB_W) lat/lng sub-grid (all pressure/time
  # slices) around the balloon; `refresh_slab` re-centers it (one full
  # streaming read) and is called by the harness every
  # `EnvParams.field_cache_every` steps, amortizing the full read.
  slab: Optional[jnp.ndarray] = None  # (SLAB_W, SLAB_W, 10, 9, 2).
  slab_x0: Optional[jnp.ndarray] = None  # () int32 window base corner.
  slab_y0: Optional[jnp.ndarray] = None


def reset_noise(key: jax.Array):
  """Samples noise seeds/offsets (reference simplex_wind_noise.py:98-114)."""
  seed_key, offset_key = jax.random.split(key)
  seeds = jax.random.randint(seed_key, (2, 5), 0, 2**31 - 1, jnp.int32)
  offsets = jax.random.uniform(offset_key, (2, 5, 4)) * 2.0 - 1.0
  return seeds, offsets


def reset_noise_exact(noise_key: jax.Array):
  """Reference-ordered noise reset for parity mode (host-side).

  Reproduces the reference's RNG consumption EXACTLY
  (wind_field.py:195-207 reset_wind_noise -> per-component
  NoisyWindComponent.reset -> per-harmonic seed draw + grid translation,
  simplex_wind_noise.py:98-114: note the SAME harmonic key is used for
  both the seed `choice` and the `uniform` translation). The Fisher-Yates
  permutation-table builds are inherently sequential host work, which is
  why this is not jittable -- parity runs are 1-env host-orchestrated.

  Returns:
    (seeds (2, 5) int32, offsets (2, 5, 4) f32, perms (2, 5, 256) int32).
  """
  from ble_tpu.env import opensimplex4d
  noise_u_key, noise_v_key = jax.random.split(noise_key, 2)
  seeds = np.zeros((2, 5), np.int64)
  offsets = np.zeros((2, 5, 4), np.float32)
  perms = np.zeros((2, 5, 256), np.int32)
  for c, comp_key in enumerate((noise_u_key, noise_v_key)):
    harmonic_keys = jax.random.split(comp_key, num=5)
    for h in range(5):
      seed = int(jax.random.choice(harmonic_keys[h], 1634753849))
      translation = np.asarray(
          jax.random.uniform(harmonic_keys[h], (4,)) * 2.0 - 1.0)
      seeds[c, h] = seed
      offsets[c, h] = translation
      perms[c, h] = opensimplex4d.cached_perm(seed)
  return (jnp.asarray(seeds, jnp.int32), jnp.asarray(offsets),
          jnp.asarray(perms))


def make_state(field: jnp.ndarray, key: jax.Array,
               exact_noise: bool = False,
               field_dtype=None) -> WindFieldState:
  """Builds a WindFieldState; `exact_noise` selects OpenSimplex parity
  noise, `field_dtype` overrides the bf16 storage default (f32 for
  parity/eval modes; see FIELD_DTYPE)."""
  dtype = FIELD_DTYPE if field_dtype is None else field_dtype
  if exact_noise:
    seeds, offsets, perms = reset_noise_exact(key)
    return WindFieldState(field=field.astype(dtype), noise_seeds=seeds,
                          noise_offsets=offsets, noise_perms=perms)
  seeds, offsets = reset_noise(key)
  return WindFieldState(field=field.astype(dtype), noise_seeds=seeds,
                        noise_offsets=offsets)


def _boomerang_hours(elapsed_s):
  """Reflects time past the 48-h horizon (grid_based_wind_field.py:134-143)."""
  hours = jnp.asarray(elapsed_s, jnp.float32) / 3600.0
  cycle = jnp.floor(hours / TIME_HORIZON_HOURS).astype(jnp.int32)
  remainder = jnp.mod(hours, TIME_HORIZON_HOURS)
  backward = (cycle % 2) == 1
  return jnp.where(backward, TIME_HORIZON_HOURS - remainder, remainder)


def _axis_weights(coord, n: int, lo: float, hi: float):
  """Linear-interpolation weights as a dense (..., n) one-hot-pair vector.

  XLA on TPU lowers batched-operand gathers to serialized selects, so
  instead of gathering grid corners we build the (two-nonzero) weight
  vector per axis and CONTRACT it with the grid -- pure MXU work. Input is
  clamped to the grid (edge extension, as the reference's interpn
  fill_value handling).
  """
  t = (jnp.asarray(coord, jnp.float32) - lo) / (hi - lo) * (n - 1)
  t = jnp.clip(t, 0.0, n - 1)
  i0 = jnp.clip(jnp.floor(t), 0, n - 2)
  frac = t - i0
  iota = jnp.arange(n, dtype=jnp.float32)
  i0e = i0[..., None]
  return (jnp.where(iota == i0e, (1.0 - frac)[..., None], 0.0) +
          jnp.where(iota == i0e + 1.0, frac[..., None], 0.0))


# Slab-cache geometry. SLAB_W=4 keeps every corner the balloon can need
# within the window for >=1 full 50 km cell of movement from the refresh
# position (incl. at domain edges, where the query clamp and the window
# clamp coincide) -- with the default refresh cadence of 8 agent steps
# (8 x 180 s), the cache is exact for sustained winds below ~34.7 m/s,
# comfortably above stratospheric speeds (the generative fields peak well
# under 25 m/s; see docs/benchmarks.md).
SLAB_W = 4


def _grid_coord(v_km):
  """Continuous (clamped) lat/lng grid coordinate in [0, n-1]."""
  n = LATLNG_SLICES
  t = ((jnp.asarray(v_km, jnp.float32) + LATLNG_DISPLACEMENT_KM)
       / (2.0 * LATLNG_DISPLACEMENT_KM) * (n - 1))
  return jnp.clip(t, 0.0, n - 1)


def refresh_slab(state: WindFieldState, x_m, y_m) -> WindFieldState:
  """Re-centers the slab cache on (x, y): one full streaming field read.

  The 4-row selection is an exact one-hot contraction (0/1 weights in the
  field dtype), so slab entries are bit-identical to the grid's -- the
  cached column equals the full-grid column exactly while the balloon
  stays inside the window (tests/test_wind_field_cache.py)."""
  x0 = jnp.clip(jnp.floor(_grid_coord(jnp.asarray(x_m) / 1000.0)) - 1,
                0, LATLNG_SLICES - SLAB_W).astype(jnp.int32)
  y0 = jnp.clip(jnp.floor(_grid_coord(jnp.asarray(y_m) / 1000.0)) - 1,
                0, LATLNG_SLICES - SLAB_W).astype(jnp.int32)
  iota = jnp.arange(LATLNG_SLICES, dtype=jnp.int32)
  sx = (iota[None, :] == (x0 + jnp.arange(SLAB_W, dtype=jnp.int32))[:, None])
  sy = (iota[None, :] == (y0 + jnp.arange(SLAB_W, dtype=jnp.int32))[:, None])
  dtype = state.field.dtype
  # ONE joint (SLAB_W^2, 21*21) x (21*21, 180) matmul instead of chained
  # per-axis selections: the flattened field keeps its natural
  # row-major layout (ptc minor), so the dot streams it without the
  # 7x-padded X/Y-minor relayout XLA materializes for the per-axis
  # matrix form (observed as an 18 GB copy at 16384 envs).
  sel = jnp.einsum('xX,yY->xyXY', sx.astype(dtype), sy.astype(dtype),
                   preferred_element_type=dtype)
  sel = sel.reshape(SLAB_W * SLAB_W, LATLNG_SLICES * LATLNG_SLICES)
  flat = state.field.reshape(LATLNG_SLICES * LATLNG_SLICES,
                             PRESSURE_SLICES * TIME_SLICES * 2)
  slab = jnp.matmul(sel, flat, preferred_element_type=dtype).reshape(
      SLAB_W, SLAB_W, PRESSURE_SLICES, TIME_SLICES, 2)
  return state.replace(slab=slab, slab_x0=x0, slab_y0=y0)


def slab_oob(state: WindFieldState, x_m, y_m):
  """True when (x, y) falls outside the cached slab window BEFORE the
  clamp -- i.e. the documented ~34.7 m/s speed bound was violated and
  the clamped query would silently return edge winds (ADVICE r3).
  Window-edge clamps that coincide with the GRID's own edge clamp are
  not violations. Steps expose this as info['slab_oob']."""
  if state.slab is None:
    return jnp.zeros(jnp.shape(x_m), jnp.bool_)
  def axis_oob(coord, base):
    local = coord - base.astype(jnp.float32)
    lo_cl = base == 0  # Window at grid edge: grid clamp == window clamp.
    hi_cl = base == LATLNG_SLICES - SLAB_W
    return jnp.logical_or(
        jnp.logical_and(local < 0.0, jnp.logical_not(lo_cl)),
        jnp.logical_and(local > SLAB_W - 1.0, jnp.logical_not(hi_cl)))
  x_oob = axis_oob(_grid_coord(jnp.asarray(x_m, jnp.float32) / 1000.0),
                   state.slab_x0)
  y_oob = axis_oob(_grid_coord(jnp.asarray(y_m, jnp.float32) / 1000.0),
                   state.slab_y0)
  return jnp.logical_or(x_oob, y_oob)


def _window_weights(coord, base):
  """One-hot-pair weights over the SLAB_W window, clamped to its edges
  (coincides with the grid's own edge clamp when the window touches the
  domain boundary; out-of-window queries -- beyond the documented speed
  bound -- clamp to the nearest window edge and are detectable via
  `slab_oob`)."""
  local = jnp.clip(coord - base.astype(jnp.float32), 0.0, SLAB_W - 1)
  i0 = jnp.clip(jnp.floor(local), 0, SLAB_W - 2)
  frac = local - i0
  iota = jnp.arange(SLAB_W, dtype=jnp.float32)
  i0e = i0[..., None]
  return (jnp.where(iota == i0e, (1.0 - frac)[..., None], 0.0) +
          jnp.where(iota == i0e + 1.0, frac[..., None], 0.0))


def effective_column(state: WindFieldState, x_m, y_m, elapsed_s):
  """(..., 10, 2) wind column at (x, y, t): the field contracted over the
  lat/lng/time axes with linear weights. One MXU contraction replaces the
  reference's scipy.interpn corner gathers. When the slab cache is
  populated, only the (SLAB_W, SLAB_W) window is read (~14x less HBM
  traffic than the full grid)."""
  x_km = jnp.asarray(x_m, jnp.float32) / 1000.0
  y_km = jnp.asarray(y_m, jnp.float32) / 1000.0
  t_hours = _boomerang_hours(elapsed_s)
  wt = _axis_weights(t_hours, TIME_SLICES, 0.0, TIME_HORIZON_HOURS)
  if state.slab is not None:  # Trace-time dispatch, like noise_perms.
    wx = _window_weights(_grid_coord(x_km), state.slab_x0)
    wy = _window_weights(_grid_coord(y_km), state.slab_y0)
    col = jnp.einsum('...x,...xyptc->...yptc', wx.astype(state.slab.dtype),
                     state.slab, preferred_element_type=jnp.float32)
    col = jnp.einsum('...y,...yptc->...ptc', wy, col)
    return jnp.einsum('...t,...ptc->...pc', wt, col)
  wx = _axis_weights(x_km, LATLNG_SLICES, -LATLNG_DISPLACEMENT_KM,
                     LATLNG_DISPLACEMENT_KM)
  wy = _axis_weights(y_km, LATLNG_SLICES, -LATLNG_DISPLACEMENT_KM,
                     LATLNG_DISPLACEMENT_KM)
  # Chained per-axis contractions, NOT one joint einsum: the joint
  # '...x,...y,...t,...xyptc->...pc' form lowers to a kLoop VPU
  # multiply-reduce fusion that a profiler trace showed consuming >90% of
  # the whole env step at 4096 envs (2.2 ms/step); the chain lowers to
  # three dot_generals that read the field once at streaming bandwidth
  # and shrink the operand 21x per stage. The first stage runs on the
  # FIELD_DTYPE (bf16) stream with f32 accumulation; gather-based
  # alternatives all lose on TPU (joint/per-dim dynamic_slice forces a
  # 10-13x padded field relayout; flat minor-dim slices serialize, 10x
  # slower end to end -- measured, see git history).
  col = jnp.einsum('...x,...xyptc->...yptc', wx.astype(state.field.dtype),
                   state.field, preferred_element_type=jnp.float32)
  col = jnp.einsum('...y,...yptc->...ptc', wy, col)
  return jnp.einsum('...t,...ptc->...pc', wt, col)


def get_forecast(state: WindFieldState, x_m, y_m, pressure_pa, elapsed_s):
  """Forecast (u, v) [m/s] at one or a column of query points.

  Args:
    state: the wind field (leaves may carry leading batch axes if vmapped).
    x_m, y_m: offsets from the station [m]; scalars (per env).
    pressure_pa: pressure(s); may carry an extra trailing axis for columns.
    elapsed_s: seconds since the field epoch.

  Returns:
    (u, v) arrays broadcast over the query shape.
  """
  column = effective_column(state, x_m, y_m, elapsed_s)  # (..., 10, 2)
  wp = _axis_weights(pressure_pa, PRESSURE_SLICES, MIN_PRESSURE_PA,
                     MAX_PRESSURE_PA)  # (..., [P,] 10)
  uv = jnp.einsum('...n,...nc->...c', wp,
                  column[..., None, :, :] if wp.ndim > column.ndim - 1
                  else column)
  return uv[..., 0], uv[..., 1]


def get_noise(state: WindFieldState, x_m, y_m, pressure_pa, elapsed_s):
  """Simplex wind noise (u, v) [m/s] (reference wind_field.py:188-219)."""
  ftype = jnp.result_type(float)
  x_km = jnp.asarray(x_m, ftype) / 1000.0
  y_km = jnp.asarray(y_m, ftype) / 1000.0
  t_hours = jnp.asarray(elapsed_s, ftype) / 3600.0
  if state.noise_perms is not None:  # Parity mode (trace-time dispatch).
    return simplex_noise.uv_noise_exact(x_km, y_km, pressure_pa, t_hours,
                                        state.noise_perms,
                                        state.noise_offsets)
  return simplex_noise.uv_noise(x_km, y_km, pressure_pa, t_hours,
                                state.noise_seeds, state.noise_offsets)


def get_ground_truth(state: WindFieldState, x_m, y_m, pressure_pa, elapsed_s):
  """Forecast + noise (reference wind_field.py:125-145)."""
  fu, fv = get_forecast(state, x_m, y_m, pressure_pa, elapsed_s)
  nu, nv = get_noise(state, x_m, y_m, pressure_pa, elapsed_s)
  return fu + nu, fv + nv


def simple_static_field() -> jnp.ndarray:
  """The 4-direction test field (reference wind_field.py:149-184) as a grid.

  The reference returns exact 10 m/s winds by pressure band; encoding it on
  the grid reproduces those values away from band boundaries (grid pressure
  spacing is 1000 Pa; bands change at 8/10/12 kPa which are grid points;
  at a boundary the reference uses the lower band, the grid interpolates).
  """
  pressures = jnp.linspace(MIN_PRESSURE_PA, MAX_PRESSURE_PA, PRESSURE_SLICES)
  u = jnp.where(pressures < 8000.0, 10.0,
                jnp.where(pressures < 10000.0, 0.0,
                          jnp.where(pressures < 12000.0, -10.0, 0.0)))
  v = jnp.where(pressures < 8000.0, 0.0,
                jnp.where(pressures < 10000.0, 10.0,
                          jnp.where(pressures < 12000.0, 0.0, -10.0)))
  uv = jnp.stack([u, v], axis=-1)  # (10, 2)
  return jnp.broadcast_to(uv[None, None, :, None, :], GRID_SHAPE)
