"""K-step fused GP observe+query kernel vs the XLA pair
(ops/pallas_gp_window.py).

The window kernel must equal running wind_gp.observe then
wind_gp.query(column) once per step, for every step of the window --
state parity at each window boundary and level-output parity at every
step. Tolerances follow tests/test_pallas_gp_observe.py: the kernel
applies the same clamped updates with a different accumulation order.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ble_tpu.env import wind_gp
from ble_tpu.ops import pallas_gp_observe
from ble_tpu.ops import pallas_gp_window

E = pallas_gp_window.E_BLK  # One block (8 envs) exercises the full grid.
LEVELS = jnp.linspace(5000.0, 14000.0, pallas_gp_window.NUM_LEVELS)


def _batched_init(n):
  return jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape),
                      wind_gp.init())


def _obs_seq(key, k, n):
  """(K, N, 8) drifting tracks; env 3 disabled on odd steps."""
  ks = jax.random.split(key, k * n).reshape(k, n, 2)
  x = np.zeros(n)
  y = np.zeros(n)
  p = np.full(n, 9000.0)
  seq = np.zeros((k, n, 8), np.float32)
  rng = np.random.RandomState(int(jax.random.randint(key, (), 0, 1 << 30)))
  for i in range(k):
    x = x + rng.normal(0, 2000.0, n)
    y = y + rng.normal(0, 2000.0, n)
    p = np.clip(p + rng.normal(0, 150.0, n), 5500, 13500)
    seq[i, :, 0] = x
    seq[i, :, 1] = y
    seq[i, :, 2] = p
    seq[i, :, 3] = 180.0 * (i + 1)
    seq[i, :, 4] = rng.normal(0, 1.0, n)
    seq[i, :, 5] = rng.normal(0, 1.0, n)
    seq[i, :, 6] = 1.0
    seq[i, 3, 6] = 0.0 if i % 2 else 1.0
  return jnp.asarray(seq)


def _xla_rollout(state, obs_seq):
  """Reference: per-step vmapped wind_gp.observe + query_column."""
  k = obs_seq.shape[0]
  levels = []
  observe = jax.jit(jax.vmap(
      lambda s, r: wind_gp.observe(s, r[0], r[1], r[2], r[3], r[4], r[5],
                                   enabled=r[6] > 0.5)))

  def query_one(s, r):
    n = LEVELS.shape[0]
    q = jnp.stack([jnp.full((n,), r[0]), jnp.full((n,), r[1]), LEVELS,
                   jnp.full((n,), r[3])], axis=-1)
    return wind_gp.query(s, q)

  query = jax.jit(jax.vmap(query_one))
  for i in range(k):
    state = observe(state, obs_seq[i])
    means, dev = query(state, obs_seq[i])
    levels.append(jnp.concatenate([means, dev[..., None]], axis=-1))
  return state, jnp.stack(levels)


def _assert_state_close(a, b, atol):
  np.testing.assert_array_equal(np.asarray(a.active), np.asarray(b.active))
  np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))
  np.testing.assert_allclose(np.asarray(a.locations),
                             np.asarray(b.locations), atol=1e-6)
  np.testing.assert_allclose(np.asarray(a.errors), np.asarray(b.errors),
                             atol=1e-6)
  np.testing.assert_allclose(np.asarray(a.kinv), np.asarray(b.kinv),
                             atol=atol)
  np.testing.assert_allclose(np.asarray(a.alpha), np.asarray(b.alpha),
                             atol=atol)


def test_window_pressure_grid_matches_features():
  from ble_tpu.env import features
  np.testing.assert_allclose(
      np.asarray(jnp.linspace(pallas_gp_window._PRES_MIN,
                              pallas_gp_window._PRES_MAX,
                              pallas_gp_window.NUM_LEVELS)),
      np.asarray(features.PRESSURE_LEVELS), rtol=0, atol=0)


def test_window_matches_xla_pair():
  """16-step window == 16 sequential (observe, query) pairs."""
  obs = _obs_seq(jax.random.PRNGKey(0), 16, E)
  state0 = _batched_init(E)
  ref_state, ref_levels = _xla_rollout(state0, obs)
  got_state, got_levels = pallas_gp_window.window(state0, obs,
                                                  interpret=True)
  _assert_state_close(got_state, ref_state, atol=5e-3)
  np.testing.assert_allclose(np.asarray(got_levels),
                             np.asarray(ref_levels), atol=5e-3)


def test_window_chained_equals_one_window():
  """Two 8-step windows == one 16-step window (the residency carry)."""
  obs = _obs_seq(jax.random.PRNGKey(1), 16, E)
  state0 = _batched_init(E)
  s_a, lv_a = pallas_gp_window.window(state0, obs, interpret=True)
  s_b, lv_b1 = pallas_gp_window.window(state0, obs[:8], interpret=True)
  s_b, lv_b2 = pallas_gp_window.window(s_b, obs[8:], interpret=True)
  _assert_state_close(s_b, s_a, atol=1e-5)
  np.testing.assert_allclose(np.asarray(jnp.concatenate([lv_b1, lv_b2])),
                             np.asarray(lv_a), atol=1e-5)


def test_step_matches_observe_plus_query():
  """K=1 production entry == observe_batched + per-env query."""
  obs = _obs_seq(jax.random.PRNGKey(2), 6, 2 * E)
  state_ref = _batched_init(2 * E)
  state_got = _batched_init(2 * E)
  for i in range(6):
    r = obs[i]
    ref_state, ref_levels = _xla_rollout(state_ref, obs[i:i + 1])
    state_ref = ref_state
    state_got, means, dev = pallas_gp_window.step(
        state_got, r[:, 0], r[:, 1], r[:, 2], r[:, 3], r[:, 4], r[:, 5],
        enabled=r[:, 6] > 0.5, interpret=True)
    _assert_state_close(state_got, state_ref, atol=5e-3)
    np.testing.assert_allclose(np.asarray(means),
                               np.asarray(ref_levels[0, :, :, 0:2]),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(dev),
                               np.asarray(ref_levels[0, :, :, 2]),
                               atol=5e-3)


def test_window_empty_state_levels_zero():
  """No valid observations -> means and deviations exactly zero
  (wind_gp.query:161-163 contract)."""
  obs = _obs_seq(jax.random.PRNGKey(3), 2, E)
  obs = obs.at[:, :, 6].set(0.0)  # All disabled: state stays empty.
  state0 = _batched_init(E)
  got_state, levels = pallas_gp_window.window(state0, obs, interpret=True)
  np.testing.assert_array_equal(np.asarray(levels),
                                np.zeros_like(np.asarray(levels)))
  np.testing.assert_array_equal(np.asarray(got_state.active),
                                np.asarray(state0.active))


def test_window_tpu_hardware_parity():
  """The real Mosaic lowering vs the XLA pair. Skipped off-TPU.

  The round-5 restructure (lane-chunked query, sublane-concat level
  rows) exists BECAUSE the first version hung Mosaic's compiler; this
  test pins that the shipped lowering also computes the right thing on
  hardware, not just in interpret mode.
  """
  import pytest
  if jax.default_backend() != 'tpu':
    pytest.skip('requires a real TPU lowering')
  obs = _obs_seq(jax.random.PRNGKey(7), 16, E)
  state0 = _batched_init(E)
  ref_state, ref_levels = _xla_rollout(state0, obs)
  got_state, got_levels = pallas_gp_window.window(state0, obs,
                                                  interpret=False)
  _assert_state_close(got_state, ref_state, atol=5e-3)
  np.testing.assert_allclose(np.asarray(got_levels),
                             np.asarray(ref_levels), atol=5e-3)
