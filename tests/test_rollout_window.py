"""env.rollout_window (staged K-step rollout) vs K sequential steps.

The window rollout reorders the pipeline (physics scan, then a K-step
GP kernel, then wide feature assembly) but computes the same function as
K `step_batched` calls when actions are open-loop -- these tests pin
that equivalence end to end.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ble_tpu.env import env as env_lib


def _reset(n, params, key=11):
  field_fn = env_lib.make_field_fn('static')
  keys = jax.random.split(jax.random.PRNGKey(key), n)
  return jax.jit(jax.vmap(
      functools.partial(env_lib.reset, params=params,
                        field_fn=field_fn)))(keys)


def _sequential(params, state, actions):
  obs, rewards, dones = [], [], []
  for i in range(actions.shape[0]):
    out = env_lib.step_batched(params, state, actions[i], physics='xla',
                               refresh='never')
    state = out.state
    obs.append(out.observation)
    rewards.append(out.reward)
    dones.append(out.done)
  return state, jnp.stack(obs), jnp.stack(rewards), jnp.stack(dones)


def test_rollout_window_matches_sequential_steps():
  n, k = 8, 12
  params = env_lib.EnvParams()
  state, _ = _reset(n, params)
  actions = jax.random.randint(jax.random.PRNGKey(5), (k, n), 0, 3)

  ref_state, ref_obs, ref_rew, ref_done = jax.jit(
      functools.partial(_sequential, params))(state, actions)
  out = jax.jit(functools.partial(env_lib.rollout_window, params,
                                  physics='xla'))(state, actions)

  np.testing.assert_array_equal(np.asarray(out.reward),
                                np.asarray(ref_rew))
  np.testing.assert_array_equal(np.asarray(out.done), np.asarray(ref_done))
  # Positions/physics are bit-identical (same kernels, same order).
  np.testing.assert_array_equal(np.asarray(out.state.balloon.x_m),
                                np.asarray(ref_state.balloon.x_m))
  np.testing.assert_array_equal(np.asarray(out.state.balloon.pressure_pa),
                                np.asarray(ref_state.balloon.pressure_pa))
  np.testing.assert_array_equal(np.asarray(out.state.wind_u),
                                np.asarray(ref_state.wind_u))
  # Observations: the GP kernel accumulates in a different order than
  # the XLA observe (tests/test_pallas_gp_window.py tolerances).
  np.testing.assert_allclose(np.asarray(out.observation),
                             np.asarray(ref_obs), atol=2e-4)
  np.testing.assert_allclose(np.asarray(out.state.gp.kinv),
                             np.asarray(ref_state.gp.kinv), atol=5e-3)
  np.testing.assert_array_equal(np.asarray(out.state.gp.active),
                                np.asarray(ref_state.gp.active))
  np.testing.assert_array_equal(np.asarray(out.state.gp.count),
                                np.asarray(ref_state.gp.count))


def test_rollout_window_with_field_cache():
  """Slab-cached window == uncached window (the cache contract holds
  through the staged pipeline)."""
  n, k = 8, 8
  actions = jax.random.randint(jax.random.PRNGKey(9), (k, n), 0, 3)

  def run(params):
    state, _ = _reset(n, params)
    if params.field_cache:
      state = env_lib.refresh_field_cache(state)
    out = jax.jit(functools.partial(env_lib.rollout_window, params,
                                    physics='xla'))(state, actions)
    return out

  base = run(env_lib.EnvParams())
  cached = run(env_lib.EnvParams(field_cache=True))
  np.testing.assert_array_equal(np.asarray(cached.reward),
                                np.asarray(base.reward))
  np.testing.assert_array_equal(np.asarray(cached.observation),
                                np.asarray(base.observation))


def test_rollout_window_chain_matches_long_window():
  """Two 6-step windows chained == one 12-step window."""
  n = 8
  params = env_lib.EnvParams()
  state, _ = _reset(n, params)
  actions = jax.random.randint(jax.random.PRNGKey(3), (12, n), 0, 3)

  roll = jax.jit(functools.partial(env_lib.rollout_window, params,
                                   physics='xla'))
  full = roll(state, actions)
  half1 = roll(state, actions[:6])
  half2 = roll(half1.state, actions[6:])
  np.testing.assert_array_equal(
      np.asarray(jnp.concatenate([half1.reward, half2.reward])),
      np.asarray(full.reward))
  np.testing.assert_allclose(
      np.asarray(jnp.concatenate([half1.observation, half2.observation])),
      np.asarray(full.observation), atol=1e-5)
