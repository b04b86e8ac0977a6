"""Atmosphere tests: standard-atmosphere values and inversion consistency.

Mirrors the reference's standard_atmosphere_test strategy (SURVEY.md
section 4): check against published US Standard Atmosphere table values and
that at_height/at_pressure are mutual inverses, plus lapse randomization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ble_tpu.env import atmosphere


@pytest.fixture(scope="module")
def atmo():
  # alpha=1.0 selects LAPSE_RATES_HIGH; alpha has no effect above 17km.
  return atmosphere.make(jnp.float32(0.0))


def test_sea_level_values(atmo):
  pressure, temperature, density = atmosphere.at_height(atmo, 0.0)
  # Base profile: T = 300 + (-0.007) * 610 at h=0 from the -610m anchor.
  expected_t = 300.0 - 0.007 * 610.0
  assert abs(float(temperature) - expected_t) < 0.01
  assert 90000.0 < float(pressure) < 110000.0
  assert 1.0 < float(density) < 1.4


def test_height_pressure_roundtrip(atmo):
  heights = jnp.asarray([0.0, 5000.0, 11000.0, 15240.0, 18000.0, 25000.0,
                         40000.0, 60000.0])
  pressure, _, _ = atmosphere.at_height(atmo, heights)
  h2, _, _ = atmosphere.at_pressure(atmo, pressure)
  np.testing.assert_allclose(np.asarray(h2), np.asarray(heights), rtol=2e-4,
                             atol=2.0)


def test_pressure_monotonic_in_height(atmo):
  heights = jnp.linspace(-500.0, 80000.0, 200)
  pressure, temperature, _ = atmosphere.at_height(atmo, heights)
  p = np.asarray(pressure)
  assert np.all(np.diff(p) < 0)
  assert np.all(np.asarray(temperature) > 150.0)
  assert np.all(np.asarray(temperature) < 320.0)


def test_at_pressure_temperature_consistency(atmo):
  pressures = jnp.asarray([100000.0, 50000.0, 10000.0, 6000.0, 5000.0])
  h, t_from_p, _ = atmosphere.at_pressure(atmo, pressures)
  _, t_from_h, _ = atmosphere.at_height(atmo, h)
  np.testing.assert_allclose(np.asarray(t_from_p), np.asarray(t_from_h),
                             rtol=1e-4)


def test_reset_randomizes_lapse_rates():
  a0 = atmosphere.reset(jax.random.PRNGKey(0))
  a1 = atmosphere.reset(jax.random.PRNGKey(1))
  assert not np.allclose(np.asarray(a0.lapse_rates),
                         np.asarray(a1.lapse_rates))
  # All profiles blend between the two tables.
  low = np.asarray(atmosphere.LAPSE_RATES_LOW)
  high = np.asarray(atmosphere.LAPSE_RATES_HIGH)
  lr = np.asarray(a0.lapse_rates)
  assert np.all(lr >= np.minimum(low, high) - 1e-7)
  assert np.all(lr <= np.maximum(low, high) + 1e-7)


def test_batched_params():
  keys = jax.random.split(jax.random.PRNGKey(0), 4)
  atmos = jax.vmap(atmosphere.reset)(keys)
  assert atmos.lapse_rates.shape == (4, 7)
  p, t, _ = atmosphere.at_height(atmos, jnp.full((4,), 18000.0))
  assert p.shape == (4,)
  assert np.all(np.asarray(t) > 180.0)
