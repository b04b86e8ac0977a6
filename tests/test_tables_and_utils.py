"""Tests for ACS/power tables, transforms, time, and spherical geometry."""

import bisect
import datetime as dt
import math

import jax.numpy as jnp
import numpy as np
from scipy.interpolate import RegularGridInterpolator

from ble_tpu.env import acs
from ble_tpu.env import power_table
from ble_tpu.utils import time_lib
from ble_tpu.utils import spherical
from ble_tpu.utils import transforms


# --- ACS tables ---


def test_most_efficient_power_knots():
  for pr, expected in [(1.0, 100.0), (1.05, 100.0), (1.2, 300.0),
                       (1.25, 400.0), (1.35, 400.0), (1.5, 400.0)]:
    assert abs(float(acs.get_most_efficient_power(jnp.float32(pr))) -
               expected) < 1e-3


def test_fan_efficiency_matches_bilinear():
  grid = RegularGridInterpolator(
      (np.linspace(100.0, 400.0, 4), np.linspace(1.05, 1.35, 13)),
      np.asarray(acs._EFF_TABLE), bounds_error=False, fill_value=None)
  rng = np.random.RandomState(0)
  prs = rng.uniform(1.05, 1.35, 50)
  powers = rng.uniform(100.0, 400.0, 50)
  mine = np.asarray(acs.get_fan_efficiency(jnp.asarray(prs),
                                           jnp.asarray(powers)))
  ref = grid(np.stack([powers, prs], axis=-1))
  np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_mass_flow():
  assert abs(float(acs.get_mass_flow(jnp.float32(300.0), jnp.float32(0.2))) -
             300.0 * 0.2 / 3600.0) < 1e-9


# --- Power table ---


def _reference_power_lookup(pressure_ratio, soc):
  """Pure-python reimplementation of the reference bisect lookup
  (env/balloon/power_table.py:21-38) used as a test oracle."""
  pressure_ratio_intervals = [1.08, 1.11, 1.14, 1.17, 1.2, 1.23, 1.26]
  soc_mappings = [
      ([0.3, 0.4, 0.5], [0, 150, 175, 200]),
      ([0.3, 0.4, 0.7], [0, 200, 200, 225]),
      ([0.3, 0.4, 0.6], [0, 225, 225, 250]),
      ([0.3, 0.4, 0.5], [0, 200, 225, 250]),
      ([0.3, 0.4, 0.5], [0, 225, 250, 275]),
      ([0.4, 0.5], [0, 275, 300]),
      ([0.5, 0.6], [0, 300, 325]),
      ([0.5, 0.6], [0, 325, 350]),
  ]
  pr_id = bisect.bisect(pressure_ratio_intervals, pressure_ratio)
  soc_id = bisect.bisect(soc_mappings[pr_id][0], soc)
  return soc_mappings[pr_id][1][soc_id]


def test_power_table_matches_reference_bisect():
  rng = np.random.RandomState(1)
  prs = rng.uniform(0.99, 2.0, 200)
  socs = rng.uniform(0.0, 1.0, 200)
  mine = np.asarray(power_table.lookup(jnp.asarray(prs), jnp.asarray(socs)))
  ref = np.asarray([_reference_power_lookup(p, s) for p, s in zip(prs, socs)])
  np.testing.assert_array_equal(mine, ref)
  # Boundary semantics: soc exactly at a threshold goes right.
  assert float(power_table.lookup(jnp.float32(1.0), jnp.float32(0.4))) == 175.0


# --- Transforms ---


def test_transforms_roundtrip():
  x = jnp.asarray([0.0, 0.3, 5.0, 100.0])
  squashed = transforms.squash_to_unit_interval(x, 30.0)
  np.testing.assert_allclose(
      np.asarray(transforms.undo_squash_to_unit_interval(squashed, 30.0)),
      np.asarray(x), rtol=1e-5)
  scaled = transforms.linear_rescale_with_extrapolation(x, -10.0, 50.0)
  np.testing.assert_allclose(
      np.asarray(
          transforms.undo_linear_rescale_with_extrapolation(scaled, -10.0,
                                                            50.0)),
      np.asarray(x), rtol=1e-5, atol=1e-5)
  sat = transforms.linear_rescale_with_saturation(jnp.asarray(200.0), 0.0,
                                                  100.0)
  assert float(sat) == 1.0


# --- Time ---


def test_civil_from_unix_seconds_matches_datetime():
  rng = np.random.RandomState(2)
  stamps = rng.randint(1290000000, 1420000000, size=100)
  y, m, d, sod = time_lib.civil_from_unix_seconds(jnp.asarray(stamps))
  for i, s in enumerate(stamps):
    ref = dt.datetime.fromtimestamp(int(s), tz=dt.timezone.utc)
    assert int(y[i]) == ref.year
    assert int(m[i]) == ref.month
    assert int(d[i]) == ref.day
    assert int(sod[i]) == (ref.hour * 3600 + ref.minute * 60 + ref.second)


def test_days_from_j2000_reference_point():
  # 2000-01-01 12:00 UTC is J2000: zero days.
  t = time_lib.unix_seconds_from_datetime(
      dt.datetime(2000, 1, 1, 12, tzinfo=dt.timezone.utc))
  jd, frac = time_lib.days_from_j2000(jnp.asarray(t, jnp.int32))
  assert abs(float(jd)) < 1e-3
  assert abs(float(frac) - 0.5) < 1e-6
  # One year later: 366 days (2000 was a leap year).
  t1 = time_lib.unix_seconds_from_datetime(
      dt.datetime(2001, 1, 1, 12, tzinfo=dt.timezone.utc))
  jd1, _ = time_lib.days_from_j2000(jnp.asarray(t1, jnp.int32))
  assert abs(float(jd1) - 366.0) < 1e-3


# --- Spherical geometry ---


def test_latlng_from_offset_small_displacement():
  lat0, lng0 = math.radians(10.0), math.radians(20.0)
  # 111.19 km north is ~1 degree of latitude.
  lat, lng = spherical.latlng_from_offset(lat0, lng0, 0.0, 111194.9)
  assert abs(math.degrees(float(lat)) - 11.0) < 0.01
  assert abs(math.degrees(float(lng)) - 20.0) < 0.01
  # East displacement at 10N: dlng = x / (R cos(lat)).
  lat2, lng2 = spherical.latlng_from_offset(lat0, lng0, 111194.9, 0.0)
  expected_dlng = 111194.9 / (spherical.EARTH_RADIUS_M * math.cos(lat0))
  assert abs(float(lng2) - (lng0 + expected_dlng)) < 2e-4
  assert abs(float(lat2) - lat0) < 2e-4


def test_latlng_offset_zero():
  lat, lng = spherical.latlng_from_offset(0.5, -1.0, 0.0, 0.0)
  assert abs(float(lat) - 0.5) < 1e-7
  assert abs(float(lng) + 1.0) < 1e-6
