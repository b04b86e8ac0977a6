"""pmath vs jnp reference implementations."""

import jax.numpy as jnp
import numpy as np

from ble_tpu.ops import pmath


def test_atan2_matches_jnp():
  rng = np.random.RandomState(0)
  y = jnp.asarray(rng.randn(1000) * 10, jnp.float32)
  x = jnp.asarray(rng.randn(1000) * 10, jnp.float32)
  np.testing.assert_allclose(np.asarray(pmath.atan2(y, x)),
                             np.asarray(jnp.arctan2(y, x)), atol=2e-6)
  # Axes and quadrants.
  for yy, xx in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (-1, -1), (0, 0)]:
    assert abs(float(pmath.atan2(float(yy), float(xx))) -
               float(jnp.arctan2(float(yy), float(xx)))) < 2e-6


def test_asin_acos_match():
  x = jnp.linspace(-1.0, 1.0, 1001)
  np.testing.assert_allclose(np.asarray(pmath.asin(x)),
                             np.asarray(jnp.arcsin(x)), atol=3e-6)
  np.testing.assert_allclose(np.asarray(pmath.acos(x)),
                             np.asarray(jnp.arccos(x)), atol=3e-6)


def test_fmod_matches():
  rng = np.random.RandomState(1)
  a = jnp.asarray(rng.randn(500) * 2000, jnp.float32)
  np.testing.assert_allclose(np.asarray(pmath.fmod(a, 1440.0)),
                             np.asarray(jnp.fmod(a, 1440.0)), atol=1e-3)


def test_powf():
  x = jnp.asarray([0.0, 1e-6, 0.5, 2.0, 1804.0], jnp.float32)
  for p in (2.0 / 3.0, 0.25, 1.5, 0.9, 1.0 / 12.0, 1.0 / 3.0):
    np.testing.assert_allclose(np.asarray(pmath.powf(x, p)),
                               np.asarray(x ** p), rtol=2e-5, atol=1e-30)
