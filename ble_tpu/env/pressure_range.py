"""Accessible pressure range given superpressure safety buffers.

Vectorized re-design of the reference
``env/balloon/pressure_range_builder.py``: the sequential scan over a
20-level pressure column with first-crossing linear interpolation
(pressure_range_builder.py:105-182) becomes mask/argmax arithmetic over
the whole column, evaluated for every balloon in the batch at once.
"""

import jax
import jax.numpy as jnp

from ble_tpu.env import atmosphere as atmosphere_lib
from ble_tpu.env import safety
from ble_tpu.env import stable_init
from ble_tpu.utils import constants

NUM_LEVELS = 20
SEARCH_RANGE_MIN_PA = 1000.0


def _interp_with_extrapolation(x, xp, fp):
  """Linear interpolation with extrapolation; xp may have batch dims."""
  x = jnp.asarray(x, jnp.float32)
  # Manual searchsorted(side='right') that supports a batched sorted axis.
  count = jnp.sum((xp <= x[..., None]).astype(jnp.int32), axis=-1)
  idx = jnp.clip(count - 1, 0, xp.shape[-1] - 2)
  x0 = jnp.take_along_axis(xp, idx[..., None], axis=-1)[..., 0]
  x1 = jnp.take_along_axis(xp, idx[..., None] + 1, axis=-1)[..., 0]
  f0 = jnp.take_along_axis(fp, idx[..., None], axis=-1)[..., 0]
  f1 = jnp.take_along_axis(fp, idx[..., None] + 1, axis=-1)[..., 0]
  return f0 + (x - x0) * (f1 - f0) / (x1 - x0)


def _threshold_crossing(p1, sp1, p2, sp2, min_sp, max_sp):
  """Pressure where superpressure crosses the violated safety threshold.

  Mirrors _compute_safe_pressure (pressure_range_builder.py:68-102):
  chooses the min_sp crossing when the pair straddles min_sp, otherwise
  the max_sp crossing.
  """
  crosses_min = (sp1 < min_sp) != (sp2 < min_sp)
  y_star = jnp.where(crosses_min, min_sp, max_sp)
  denom = jnp.where(sp2 == sp1, 1.0, sp2 - sp1)
  alpha = jnp.abs((y_star - sp1) / denom)
  return alpha * (p2 - p1) + p1


def get_pressure_range(pressure_levels, sp_levels, sp_min_significant,
                       min_pressure_significant, min_sp, max_sp):
  """(min_pressure, max_pressure) with safe superpressure.

  Args:
    pressure_levels: (..., 20) ascending pressure column [Pa].
    sp_levels: (..., 20) stable superpressure at each level.
    sp_min_significant: superpressure at `min_pressure_significant`.
    min_pressure_significant: the max-altitude pressure (from the P/T
      interpolation); the max-pressure significant point is
      pressure_levels[..., -1] whose superpressure is sp_levels[..., -1].
    min_sp: minimum safe superpressure (= envelope BUFFER).
    max_sp: maximum safe superpressure (= max_superpressure - BUFFER).

  Returns:
    (min_pressure, max_pressure) arrays.
  """
  def in_range(sp):
    return jnp.logical_and(sp >= min_sp, sp <= max_sp)

  n = pressure_levels.shape[-1]
  idx = jnp.arange(n)

  # ---- Min pressure: ascending scan over levels >= significant
  # (_find_min_pressure_with_safe_superpressure, direction='max'). ----
  considered_up = pressure_levels >= min_pressure_significant[..., None]
  safe_up = jnp.logical_and(considered_up, in_range(sp_levels))
  any_safe_up = jnp.any(safe_up, axis=-1)
  j_up = jnp.argmax(safe_up, axis=-1)  # First safe ascending index.
  # First considered index.
  i0_up = jnp.argmax(considered_up, axis=-1)
  has_prev_level = j_up > i0_up
  prev_idx = jnp.maximum(j_up - 1, 0)
  prev_p = jnp.where(
      has_prev_level,
      jnp.take_along_axis(pressure_levels, prev_idx[..., None], -1)[..., 0],
      min_pressure_significant)
  prev_sp = jnp.where(
      has_prev_level,
      jnp.take_along_axis(sp_levels, prev_idx[..., None], -1)[..., 0],
      sp_min_significant)
  cur_p = jnp.take_along_axis(pressure_levels, j_up[..., None], -1)[..., 0]
  cur_sp = jnp.take_along_axis(sp_levels, j_up[..., None], -1)[..., 0]
  min_pressure = _threshold_crossing(prev_p, prev_sp, cur_p, cur_sp, min_sp,
                                     max_sp)
  # If the significant pressure itself is already safe, it is the answer.
  min_pressure = jnp.where(in_range(sp_min_significant),
                           min_pressure_significant, min_pressure)
  # Pathological fallback (reference raises): clamp to the top of the range.
  min_pressure = jnp.where(
      jnp.logical_or(any_safe_up, in_range(sp_min_significant)), min_pressure,
      pressure_levels[..., -1])

  # ---- Max pressure: descending scan over all levels (significant is the
  # last level; direction='min'). ----
  max_pressure_significant = pressure_levels[..., -1]
  sp_max_significant = sp_levels[..., -1]
  safe_dn = in_range(sp_levels)
  # First safe index when scanning descending == last safe index such that
  # everything above it is unsafe; the descending scan stops at the FIRST
  # safe it meets, i.e. the largest index j with safe[j] and unsafe for all
  # k > j... which is simply the largest j where safe[j] and
  # all(k > j: ~safe[k]). Compute via reversed argmax.
  rev_first = jnp.argmax(jnp.flip(safe_dn, axis=-1), axis=-1)
  j_dn = (n - 1) - rev_first
  any_safe_dn = jnp.any(safe_dn, axis=-1)
  has_next_level = j_dn < (n - 1)
  next_idx = jnp.minimum(j_dn + 1, n - 1)
  next_p = jnp.where(
      has_next_level,
      jnp.take_along_axis(pressure_levels, next_idx[..., None], -1)[..., 0],
      max_pressure_significant)
  next_sp = jnp.where(
      has_next_level,
      jnp.take_along_axis(sp_levels, next_idx[..., None], -1)[..., 0],
      sp_max_significant)
  cur_p_dn = jnp.take_along_axis(pressure_levels, j_dn[..., None], -1)[..., 0]
  cur_sp_dn = jnp.take_along_axis(sp_levels, j_dn[..., None], -1)[..., 0]
  max_pressure = _threshold_crossing(cur_p_dn, cur_sp_dn, next_p, next_sp,
                                     min_sp, max_sp)
  max_pressure = jnp.where(in_range(sp_max_significant),
                           max_pressure_significant, max_pressure)
  max_pressure = jnp.where(
      jnp.logical_or(any_safe_dn, in_range(sp_max_significant)), max_pressure,
      pressure_levels[..., 0])

  return min_pressure, max_pressure


def compute_pressure_range(params, atmosphere: atmosphere_lib.AtmosphereParams,
                           solar_elevation_deg, solar_flux,
                           upwelling_infrared):
  """Full pipeline (reference get_pressure_range,
  pressure_range_builder.py:203-275) for a batch of balloons.

  Args:
    params: BalloonParams (broadcastable leaves).
    atmosphere: AtmosphereParams with leaves shaped (..., 7/8).
    solar_elevation_deg, solar_flux, upwelling_infrared: (...) per balloon.

  Returns:
    (min_pressure, max_pressure), each shaped like the batch.
  """
  min_sp = safety.ENVELOPE_BUFFER
  max_sp = params.envelope_max_superpressure - safety.ENVELOPE_BUFFER

  search_max, _, _ = atmosphere_lib.at_height(atmosphere,
                                              safety.ALTITUDE_MIN_M)
  frac = jnp.linspace(0.0, 1.0, NUM_LEVELS)
  pressure_levels = (SEARCH_RANGE_MIN_PA +
                     frac * (search_max[..., None] - SEARCH_RANGE_MIN_PA))

  _, column_temps, _ = atmosphere_lib.at_pressure(
      _expand(atmosphere), pressure_levels)

  total_empty_mass = (params.payload_mass + params.envelope_mass +
                      params.mols_lift_gas * constants.HE_MOLAR_MASS)
  max_altitude_p_over_t = (
      total_empty_mass * constants.UNIVERSAL_GAS_CONSTANT /
      (constants.DRY_AIR_MOLAR_MASS * params.envelope_volume_base))
  p_over_t = pressure_levels / column_temps
  min_pressure_significant = _interp_with_extrapolation(
      max_altitude_p_over_t, p_over_t, pressure_levels)

  # Stable superpressure at every level plus the min-pressure significant
  # point, in one vectorized Newton solve over the trailing level axis.
  all_pressures = jnp.concatenate(
      [pressure_levels, min_pressure_significant[..., None]], axis=-1)
  stable = stable_init.calculate_stable_params_for_pressure(
      all_pressures, _b(params.envelope_volume_base),
      _b(params.envelope_volume_dv_pressure), _b(params.envelope_mass),
      _b(params.payload_mass), _b(params.mols_lift_gas),
      _b(solar_elevation_deg), _b(solar_flux), _b(upwelling_infrared),
      _expand(atmosphere))
  sp_all = stable.superpressure
  sp_levels = sp_all[..., :NUM_LEVELS]
  sp_min_significant = sp_all[..., NUM_LEVELS]

  return get_pressure_range(pressure_levels, sp_levels, sp_min_significant,
                            min_pressure_significant, min_sp, max_sp)


def _b(x):
  """Appends a broadcast level axis to a per-balloon scalar field."""
  return jnp.asarray(x)[..., None]


def _expand(atmosphere: atmosphere_lib.AtmosphereParams):
  """Inserts a level axis before the layer axis of atmosphere leaves."""
  return jax.tree.map(lambda leaf: leaf[..., None, :], atmosphere)
