"""Solar model tests: NOAA-style sanity values and sunrise/sunset search.

The reference validates its calculator against NOAA-ish expected values
(solar_test.py per SURVEY.md section 4); here we check well-known solar
facts (equinox geometry, flux bounds, day/night cycle) and that the
vectorized sunrise/sunset scan brackets MIN_SOLAR_EL_DEG crossings.
"""

import datetime as dt
import math

import jax.numpy as jnp
import numpy as np

from ble_tpu.env import solar
from ble_tpu.utils import time_lib


def _ts(*args):
  return time_lib.unix_seconds_from_datetime(
      dt.datetime(*args, tzinfo=dt.timezone.utc))


def test_equinox_noon_elevation_at_equator():
  # 2012-03-20 was the March equinox; at lng=0 solar noon ~ 12:07 UTC.
  t = _ts(2012, 3, 20, 12, 7)
  el, _, _ = solar.solar_calculator(0.0, 0.0, t)
  assert float(el) > 85.0


def test_midnight_elevation_is_negative():
  t = _ts(2012, 6, 1, 0, 0)
  el, _, _ = solar.solar_calculator(0.0, 0.0, t)
  assert float(el) < -60.0


def test_flux_within_annual_bounds():
  for month, day in [(1, 3), (4, 10), (7, 4), (10, 15)]:
    _, _, flux = solar.solar_calculator(0.1, 0.5, _ts(2013, month, day, 6))
    assert 1300.0 < float(flux) < 1430.0
  # Perihelion (early Jan) flux exceeds aphelion (early Jul) flux.
  _, _, f_jan = solar.solar_calculator(0.0, 0.0, _ts(2013, 1, 3, 12))
  _, _, f_jul = solar.solar_calculator(0.0, 0.0, _ts(2013, 7, 4, 12))
  assert float(f_jan) > float(f_jul)


def test_longitude_shifts_solar_time():
  t = _ts(2012, 5, 10, 12, 0)
  el_0, _, _ = solar.solar_calculator(0.0, 0.0, t)
  # 90 degrees west: local solar time is 6am, sun much lower.
  el_w, _, _ = solar.solar_calculator(0.0, math.radians(-90.0), t)
  assert float(el_0) > float(el_w)


def test_attenuation_range():
  att_high = solar.solar_atmospheric_attenuation(90.0, 6000.0)
  att_low = solar.solar_atmospheric_attenuation(0.0, 6000.0)
  att_night = solar.solar_atmospheric_attenuation(-10.0, 6000.0)
  assert 0.9 < float(att_high) <= 1.0
  assert 0.0 < float(att_low) < float(att_high)
  assert float(att_night) == 0.0


def test_solar_power_positive_daytime():
  p = solar.solar_power(jnp.asarray(45.0), jnp.asarray(8000.0))
  assert 100.0 < float(p) < 1300.0
  p_night = solar.solar_power(jnp.asarray(-10.0), jnp.asarray(8000.0))
  assert float(p_night) == 0.0


def test_sunrise_sunset_bracket_crossing():
  lat, lng = math.radians(5.0), math.radians(20.0)
  t = _ts(2012, 8, 1, 3, 0)
  sunrise, sunset = solar.next_sunrise_sunset(
      jnp.asarray(lat), jnp.asarray(lng), jnp.asarray(t, jnp.int32))
  sunrise, sunset = int(sunrise), int(sunset)
  assert t < sunrise < t + 86400 + 3600
  assert t < sunset < t + 86400 + 3600

  # Each event sits ON the threshold (sub-grid secant refinement) and the
  # elevation straddles it across the surrounding 3-minute bracket.
  for event, rising in [(sunrise, True), (sunset, False)]:
    el_at, _, _ = solar.solar_calculator(lat, lng, event)
    assert abs(float(el_at) - solar.MIN_SOLAR_EL_DEG) < 0.02
    el_before, _, _ = solar.solar_calculator(lat, lng, event - 180)
    el_after, _, _ = solar.solar_calculator(lat, lng, event + 180)
    if rising:
      assert float(el_before) < solar.MIN_SOLAR_EL_DEG < float(el_after)
    else:
      assert float(el_before) > solar.MIN_SOLAR_EL_DEG > float(el_after)


def test_sunrise_sunset_batched():
  lats = jnp.asarray([0.0, 0.1, -0.1])
  lngs = jnp.asarray([0.0, 1.0, -1.0])
  t = jnp.full((3,), _ts(2013, 2, 1, 0, 0), jnp.int32)
  sunrise, sunset = solar.next_sunrise_sunset(lats, lngs, t)
  assert sunrise.shape == (3,)
  assert np.all(np.asarray(sunrise) > np.asarray(t))
