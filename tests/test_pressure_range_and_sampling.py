"""Tests for the accessible-pressure-range pipeline and initial-condition
samplers (reference pressure_range_builder_test.py and sampling_test.py
obligations, SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from ble_tpu.env import atmosphere as atmosphere_lib
from ble_tpu.env import balloon as balloon_lib
from ble_tpu.env import pressure_range
from ble_tpu.env import safety
from ble_tpu.env import stable_init
from ble_tpu.utils import sampling


# ---------------------------------------------------------------------------
# get_pressure_range on synthetic superpressure columns (the reference's
# AccessiblePressureRangeTest checks crossings and clamping behavior).
# ---------------------------------------------------------------------------


def _column(sp_values, p_lo=5000.0, p_hi=12000.0):
  n = len(sp_values)
  levels = jnp.linspace(p_lo, p_hi, n)
  return levels, jnp.asarray(sp_values, jnp.float32)


def test_pressure_range_all_safe_spans_column():
  levels, sps = _column([500.0] * 20)
  min_p, max_p = pressure_range.get_pressure_range(
      levels, sps, jnp.float32(500.0), levels[0],
      min_sp=250.0, max_sp=1000.0)
  # Significant points are both in-range, so the range is the full span.
  np.testing.assert_allclose(float(min_p), float(levels[0]))
  np.testing.assert_allclose(float(max_p), float(levels[-1]))


def test_pressure_range_low_sp_crossing_interpolated():
  # Superpressure rises linearly 0 -> 950 across the column; with
  # min_sp=250 the low-pressure end is unsafe until sp crosses 250.
  sp = np.linspace(0.0, 950.0, 20)
  levels, sps = _column(sp)
  min_p, max_p = pressure_range.get_pressure_range(
      levels, sps, jnp.float32(sp[0]), levels[0],
      min_sp=250.0, max_sp=1000.0)
  # Analytic crossing: sp(p) = 950*(p-5000)/7000 = 250 => p = 5000+7000*250/950
  expected = 5000.0 + 7000.0 * 250.0 / 950.0
  np.testing.assert_allclose(float(min_p), expected, rtol=1e-5)
  np.testing.assert_allclose(float(max_p), float(levels[-1]))


def test_pressure_range_high_sp_blocks_bottom():
  # sp exceeds max_sp at the high-pressure (low-altitude) end: descending
  # scan interpolates the max_sp crossing.
  sp = np.linspace(300.0, 1900.0, 20)
  levels, sps = _column(sp)
  min_p, max_p = pressure_range.get_pressure_range(
      levels, sps, jnp.float32(sp[0]), levels[0],
      min_sp=250.0, max_sp=1000.0)
  np.testing.assert_allclose(float(min_p), float(levels[0]))
  expected = 5000.0 + 7000.0 * (1000.0 - 300.0) / 1600.0
  np.testing.assert_allclose(float(max_p), expected, rtol=1e-5)


def test_pressure_range_nothing_safe_clamps():
  levels, sps = _column([5000.0] * 20)  # Everything above max_sp.
  min_p, max_p = pressure_range.get_pressure_range(
      levels, sps, jnp.float32(5000.0), levels[0],
      min_sp=250.0, max_sp=1000.0)
  # Reference raises; we clamp to a degenerate (top, bottom) range.
  np.testing.assert_allclose(float(min_p), float(levels[-1]))
  np.testing.assert_allclose(float(max_p), float(levels[0]))


def test_compute_pressure_range_pipeline_batched():
  params = balloon_lib.BalloonParams()
  keys = jax.random.split(jax.random.PRNGKey(0), 4)
  atmos = jax.vmap(atmosphere_lib.reset)(keys)
  elev = jnp.full((4,), 45.0)
  flux = jnp.full((4,), 1300.0)
  ir = jnp.full((4,), 250.0)
  min_p, max_p = jax.jit(pressure_range.compute_pressure_range)(
      params, atmos, elev, flux, ir)
  assert min_p.shape == (4,)
  mn, mx = np.asarray(min_p), np.asarray(max_p)
  assert np.all(mn < mx), (mn, mx)
  assert np.all(mn >= pressure_range.SEARCH_RANGE_MIN_PA)
  # Max accessible pressure cannot exceed the 50 kft floor pressure.
  floor_p, _, _ = atmosphere_lib.at_height(atmos, safety.ALTITUDE_MIN_M)
  assert np.all(mx <= np.asarray(floor_p) + 0.1)  # f32 noise on ~12 kPa.
  # Stable superpressure strictly inside the range respects the buffers
  # (the property the reference scan guarantees level-by-level).
  mid = jnp.asarray((mn + mx) / 2.0)
  stable = stable_init.calculate_stable_params_for_pressure(
      mid, params.envelope_volume_base, params.envelope_volume_dv_pressure,
      params.envelope_mass, params.payload_mass, params.mols_lift_gas,
      elev, flux, ir, atmos)
  sp_mid = np.asarray(stable.superpressure)
  max_sp = params.envelope_max_superpressure - safety.ENVELOPE_BUFFER
  assert np.all(sp_mid >= safety.ENVELOPE_BUFFER - 1.0), sp_mid
  assert np.all(sp_mid <= max_sp + 1.0), sp_mid


# ---------------------------------------------------------------------------
# Samplers (reference utils/sampling.py distributions).
# ---------------------------------------------------------------------------


def test_sample_location_ranges():
  keys = jax.random.split(jax.random.PRNGKey(1), 256)
  lat, lng = jax.vmap(sampling.sample_location)(keys)
  lat, lng = np.degrees(np.asarray(lat)), np.degrees(np.asarray(lng))
  assert np.all((lat >= -10.0) & (lat <= 10.0))
  assert np.all((lng >= -175.0) & (lng <= 175.0))
  assert lat.std() > 2.0 and lng.std() > 30.0  # Actually spread out.


def test_sample_time_range_and_spread():
  keys = jax.random.split(jax.random.PRNGKey(2), 256)
  t = np.asarray(jax.vmap(sampling.sample_time)(keys))
  assert np.all(t >= sampling._TIME_BEGIN_S)
  assert np.all(t < sampling._TIME_END_S)
  # Spread over the 4 years, not clustered.
  assert t.std() > 0.15 * (sampling._TIME_END_S - sampling._TIME_BEGIN_S)


def test_sample_pressure_range():
  atmo = atmosphere_lib.reset(jax.random.PRNGKey(3))
  keys = jax.random.split(jax.random.PRNGKey(4), 256)
  p = np.asarray(jax.vmap(lambda k: sampling.sample_pressure(k, atmo))(keys))
  floor_p, _, _ = atmosphere_lib.at_height(atmo, safety.ALTITUDE_MIN_M)
  assert np.all(p >= 6500.0)
  assert np.all(p <= float(floor_p))


def test_sample_upwelling_infrared_rejection():
  keys = jax.random.split(jax.random.PRNGKey(5), 512)
  ir = np.asarray(jax.vmap(sampling.sample_upwelling_infrared)(keys))
  assert np.all(ir >= sampling.MIN_ALLOWABLE_UPWELLING_IR)
  assert np.all(ir <= 315.0)


def test_sample_initial_offset_radius():
  keys = jax.random.split(jax.random.PRNGKey(6), 1024)
  x, y = jax.vmap(sampling.sample_initial_offset)(keys)
  r = np.hypot(np.asarray(x), np.asarray(y))
  assert np.all(r <= 200_000.0 + 1e-3)
  # Beta(1.2, 2) mean = 0.375 -> mean radius ~75 km.
  assert 60_000.0 < r.mean() < 90_000.0
