"""Fused Pallas GP column query vs the XLA path (ops/pallas_gp.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ble_tpu.env import features as features_lib
from ble_tpu.env import wind_gp
from ble_tpu.ops import pallas_gp


def _populated_state(key, n_obs):
  """A realistically-populated GP state: a drifting balloon track."""
  state = wind_gp.init()
  ks = jax.random.split(key, n_obs)
  x = y = 0.0
  p = 9000.0
  observe = jax.jit(wind_gp.observe)
  for i in range(n_obs):
    dx, dy, dp, eu, ev = np.asarray(
        jax.random.normal(ks[i], (5,)) * jnp.asarray(
            [2000.0, 2000.0, 150.0, 1.0, 1.0]))
    x, y, p = x + dx, y + dy, float(np.clip(p + dp, 5500, 13500))
    state = observe(state, x, y, p, 180.0 * (i + 1), eu, ev)
  return state, 180.0 * n_obs


def test_length_scales_pinned():
  np.testing.assert_array_equal(np.asarray(wind_gp.LENGTH_SCALES),
                                np.asarray(pallas_gp._LS, np.float32))


def test_query_column_matches_xla_query():
  for seed, n_obs in [(0, 1), (1, 12), (2, 60)]:
    state, t = _populated_state(jax.random.PRNGKey(seed), n_obs)
    pres = features_lib.PRESSURE_LEVELS
    n = pres.shape[0]
    queries = jnp.stack([jnp.full((n,), 1234.5), jnp.full((n,), -987.0),
                         pres, jnp.full((n,), t)], axis=-1)
    ref_means, ref_dev = jax.jit(wind_gp.query)(state, queries)
    means, dev = pallas_gp.query_column(state, 1234.5, -987.0, t, pres,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(means), np.asarray(ref_means),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(dev), np.asarray(ref_dev),
                               atol=2e-5)


def test_query_column_empty_state_is_zero():
  state = wind_gp.init()
  pres = features_lib.PRESSURE_LEVELS
  means, dev = pallas_gp.query_column(state, 0.0, 0.0, 0.0, pres,
                                      interpret=True)
  np.testing.assert_array_equal(np.asarray(means), 0.0)
  np.testing.assert_array_equal(np.asarray(dev), 0.0)


def test_query_column_vmapped():
  """vmap over envs (how the feature constructor runs it)."""
  s0, t0 = _populated_state(jax.random.PRNGKey(3), 8)
  s1, t1 = _populated_state(jax.random.PRNGKey(4), 25)
  batched = jax.tree.map(lambda a, b: jnp.stack([a, b]), s0, s1)
  pres = features_lib.PRESSURE_LEVELS
  xs = jnp.asarray([100.0, -5000.0])
  ys = jnp.asarray([0.0, 3000.0])
  ts = jnp.asarray([t0, t1])
  means, dev = jax.vmap(
      lambda s, x, y, t: pallas_gp.query_column(s, x, y, t, pres,
                                                interpret=True))(
                                                    batched, xs, ys, ts)
  assert means.shape == (2, pres.shape[0], 2)
  for i, (s, x, y, t) in enumerate([(s0, 100.0, 0.0, t0),
                                    (s1, -5000.0, 3000.0, t1)]):
    m1, d1 = pallas_gp.query_column(s, x, y, t, pres, interpret=True)
    np.testing.assert_allclose(np.asarray(means[i]), np.asarray(m1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dev[i]), np.asarray(d1),
                               atol=1e-6)


def test_query_column_tpu_hardware_parity():
  """The actual Mosaic lowering (not interpret mode) vs the XLA path.

  ADVICE r3 (medium): interpret mode runs full-f32 on CPU, so only a
  hardware run validates that the MXU contractions keep the variance
  cancellation at full f32 (precision=HIGHEST in ops/pallas_gp.py).
  Skipped off-TPU.
  """
  import pytest
  if jax.default_backend() != 'tpu':
    pytest.skip('requires a real TPU lowering')
  for seed, n_obs in [(1, 12), (2, 60), (5, 120)]:
    state, t = _populated_state(jax.random.PRNGKey(seed), n_obs)
    pres = features_lib.PRESSURE_LEVELS
    n = pres.shape[0]
    queries = jnp.stack([jnp.full((n,), 1234.5), jnp.full((n,), -987.0),
                         pres, jnp.full((n,), t)], axis=-1)
    ref_means, ref_dev = jax.jit(wind_gp.query)(state, queries)
    means, dev = pallas_gp.query_column(state, 1234.5, -987.0, t, pres)
    np.testing.assert_allclose(np.asarray(means), np.asarray(ref_means),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(dev), np.asarray(ref_dev),
                               atol=5e-5)
