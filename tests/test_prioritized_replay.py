"""Prioritized replay tests: sampling bias, importance weights, priority
updates, and integration with the actor-learner."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ble_tpu.agents import replay as replay_lib


def _filled_state(cfg, num_steps=40):
  state = replay_lib.init(num_envs=2, obs_dim=2, config=cfg)
  for t in range(num_steps):
    state = replay_lib.add(
        state, cfg, jnp.full((2, 2), float(t)), jnp.ones((2,), jnp.int32),
        jnp.full((2,), 1.0), jnp.zeros((2,), bool), jnp.ones((2,), bool),
        jnp.full((2,), t, jnp.int32))
  return state


def test_prioritized_sampling_biased_towards_high_priority():
  cfg = replay_lib.ReplayConfig(ring_len=64, n_step=3, batch_size=512,
                                prioritized=True)
  state = _filled_state(cfg)
  # Give slot 10 a huge priority everywhere.
  state = state.replace(
      priority=state.priority.at[:, 10].mul(1e4))
  batch = replay_lib.sample(state, cfg, jax.random.PRNGKey(0))
  slots = np.asarray(batch['slot'])
  # The boosted slot should dominate the draw.
  assert (slots == 10).mean() > 0.8
  # Importance weight of the likely slot is the minimum (normalized max=1
  # goes to the rarest samples).
  w = np.asarray(batch['weight'])
  assert w[slots == 10].max() <= w[slots != 10].min() + 1e-6


def test_uniform_when_priorities_equal():
  cfg = replay_lib.ReplayConfig(ring_len=64, n_step=3, batch_size=1024,
                                prioritized=True)
  state = _filled_state(cfg)
  batch = replay_lib.sample(state, cfg, jax.random.PRNGKey(1))
  slots = np.asarray(batch['slot'])
  # Roughly uniform over the ~36 eligible slots.
  counts = np.bincount(slots, minlength=64)
  eligible = counts[counts > 0]
  assert len(eligible) > 25
  assert eligible.max() < 1024 * 0.2


def test_update_priorities_changes_sampling():
  cfg = replay_lib.ReplayConfig(ring_len=64, n_step=3, batch_size=256,
                                prioritized=True)
  state = _filled_state(cfg)
  env_idx = jnp.zeros((4,), jnp.int32)
  slot = jnp.asarray([5, 6, 7, 8])
  state = replay_lib.update_priorities(state, cfg, env_idx, slot,
                                       jnp.full((4,), 1e6))
  p = np.asarray(state.priority)
  assert p[0, 5] > 100.0
  assert p[1, 5] == p[1, 4]  # Other env untouched.


@pytest.mark.slow
def test_actor_learner_with_prioritized_replay():
  from ble_tpu.agents import qrdqn
  from ble_tpu.env import env as env_lib
  from ble_tpu.train import learner as learner_lib
  config = learner_lib.TrainConfig(
      num_envs=4, samples_per_insert=8.0,
      qrdqn=qrdqn.QrDqnConfig(num_layers=2, hidden_units=32, num_atoms=11,
                              min_replay_history=8),
      replay=replay_lib.ReplayConfig(ring_len=64, batch_size=8,
                                     prioritized=True))
  env_params = env_lib.EnvParams()
  field_fn = env_lib.make_field_fn('static')
  ts = learner_lib.init_train_state(jax.random.PRNGKey(0), env_params,
                                    field_fn, config)
  step = jax.jit(functools.partial(learner_lib.run_episode_chunk, config,
                                   env_params, num_steps=10))
  ts, metrics = step(ts)
  assert int(ts.learner.train_steps) > 0
  # Priorities of sampled slots were rewritten from the default.
  p = np.asarray(ts.replay.priority)
  written = p[p > 0]
  assert len(np.unique(np.round(written, 6))) > 1
