"""Orbax checkpoint roundtrip + step_batched equivalence tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ble_tpu.agents import qrdqn
from ble_tpu.agents import replay as replay_lib
from ble_tpu.env import env as env_lib
from ble_tpu.train import learner as learner_lib
from ble_tpu.train import train_lib


@pytest.mark.slow
def test_step_batched_matches_vmapped_step():
  params = env_lib.EnvParams()
  field_fn = env_lib.make_field_fn('static')
  states, obs = jax.vmap(functools.partial(env_lib.reset, params=params,
                                           field_fn=field_fn))(
      jax.random.split(jax.random.PRNGKey(0), 4))
  actions = jnp.asarray([0, 1, 2, 1])

  out_v = jax.vmap(functools.partial(env_lib.step, params))(states, actions)
  out_b = env_lib.step_batched(params, states, actions, physics='xla')

  np.testing.assert_allclose(np.asarray(out_v.observation),
                             np.asarray(out_b.observation), rtol=1e-6)
  np.testing.assert_allclose(np.asarray(out_v.reward),
                             np.asarray(out_b.reward), rtol=1e-6)
  np.testing.assert_array_equal(np.asarray(out_v.done),
                                np.asarray(out_b.done))


@pytest.mark.slow
def test_checkpoint_save_restore_roundtrip(tmp_path):
  config = learner_lib.TrainConfig(
      num_envs=2,
      qrdqn=qrdqn.QrDqnConfig(num_layers=2, hidden_units=16, num_atoms=5,
                              min_replay_history=4),
      replay=replay_lib.ReplayConfig(ring_len=16, batch_size=4))
  env_params = env_lib.EnvParams()
  field_fn = env_lib.make_field_fn('static')
  ts = learner_lib.init_train_state(jax.random.PRNGKey(0), env_params,
                                    field_fn, config)
  ts, _ = jax.jit(functools.partial(learner_lib.run_episode_chunk, config,
                                    env_params, num_steps=6))(ts)

  base_dir = str(tmp_path)
  train_lib.save_checkpoint(base_dir, ts, iteration=3)

  template = learner_lib.init_train_state(jax.random.PRNGKey(1), env_params,
                                          field_fn, config)
  restored, it = train_lib.restore_latest_checkpoint(base_dir, template)
  assert it == 3
  for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(restored)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  # Restored state steps identically.
  step = jax.jit(functools.partial(learner_lib.run_episode_chunk, config,
                                   env_params, num_steps=2))
  out1, m1 = step(ts)
  out2, m2 = step(restored)
  np.testing.assert_allclose(np.asarray(m1['reward']),
                             np.asarray(m2['reward']), rtol=1e-6)


@pytest.mark.slow
def test_restore_from_older_tree_structure(tmp_path):
  """Checkpoints written before a pytree field existed still restore:
  the by-path graft keeps the template's fresh value for new fields
  (e.g. replay.actor_state added for R2D2 stored-state replay)."""
  config = learner_lib.TrainConfig(
      num_envs=2,
      qrdqn=qrdqn.QrDqnConfig(num_layers=2, hidden_units=16, num_atoms=5,
                              min_replay_history=4),
      replay=replay_lib.ReplayConfig(ring_len=16, batch_size=4))
  env_params = env_lib.EnvParams()
  field_fn = env_lib.make_field_fn('static')
  ts = learner_lib.init_train_state(jax.random.PRNGKey(0), env_params,
                                    field_fn, config)

  # Simulate an old-version checkpoint: the raw nested tree with one
  # replay field REMOVED plus one RENAMED-away field.
  from flax import serialization
  raw = serialization.to_state_dict(ts)
  del raw['replay']['priority']
  train_lib.save_checkpoint(str(tmp_path), raw, iteration=1)

  template = learner_lib.init_train_state(jax.random.PRNGKey(1), env_params,
                                          field_fn, config)
  restored, it = train_lib.restore_latest_checkpoint(str(tmp_path), template)
  assert it == 1
  # Fields present on disk: restored from the checkpoint (== ts).
  np.testing.assert_array_equal(np.asarray(restored.obs), np.asarray(ts.obs))
  np.testing.assert_array_equal(np.asarray(restored.learner.params['params']
                                           ['Dense_0']['kernel']),
                                np.asarray(ts.learner.params['params']
                                           ['Dense_0']['kernel']))
  # Field missing on disk: keeps the template's value.
  np.testing.assert_array_equal(np.asarray(restored.replay.priority),
                                np.asarray(template.replay.priority))


@pytest.mark.slow
def test_restore_without_checkpoint_returns_template(tmp_path):
  config = learner_lib.TrainConfig(
      num_envs=1,
      qrdqn=qrdqn.QrDqnConfig(num_layers=1, hidden_units=8, num_atoms=3),
      replay=replay_lib.ReplayConfig(ring_len=8, batch_size=2))
  template = learner_lib.init_train_state(
      jax.random.PRNGKey(0), env_lib.EnvParams(),
      env_lib.make_field_fn('static'), config)
  restored, it = train_lib.restore_latest_checkpoint(str(tmp_path), template)
  assert it == -1
  assert restored is template
