"""Tests for DQN/MLP agents, VAE trainer, renderer, config overrides,
agent registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ble_tpu import config as config_lib
from ble_tpu.agents import base as agents_base
from ble_tpu.agents import dqn
# Import agent modules so they register themselves.
from ble_tpu.agents import mlp_agent  # noqa: F401
from ble_tpu.agents import random_walk  # noqa: F401
from ble_tpu.agents import station_seeker  # noqa: F401
from ble_tpu.env import rendering
from ble_tpu.env.rendering import renderer as renderer_lib
from ble_tpu.generative import reservoir as reservoir_lib
from ble_tpu.generative import train_vae
from ble_tpu.train import learner as learner_lib


def test_registry_lists_agents():
  agents = agents_base.available_agents()
  for name in ['random', 'random_walk', 'station_seeker', 'mlp',
               'perciatelli44', 'quantile', 'dqn', 'finetune_perciatelli']:
    assert name in agents, agents


def test_registry_create_and_run_random():
  agent = agents_base.create_agent('random', 3, (1099,), seed=1)
  obs = np.zeros(1099, np.float32)
  a0 = agent.begin_episode(obs)
  a1 = agent.step(0.0, obs)
  assert a0 in (0, 1, 2) and a1 in (0, 1, 2)


def test_dqn_learner_reduces_loss():
  cfg = dqn.DqnConfig(num_layers=2, hidden_units=32, learning_rate=1e-3)
  state = dqn.init(jax.random.PRNGKey(0), cfg, obs_dim=8)
  rng = np.random.RandomState(0)
  batch = {
      'obs': jnp.asarray(rng.randn(32, 8), jnp.float32),
      'action': jnp.asarray(rng.randint(0, 3, 32)),
      'n_step_reward': jnp.asarray(rng.rand(32), jnp.float32),
      'bootstrap_discount': jnp.zeros((32,)),
      'next_obs': jnp.asarray(rng.randn(32, 8), jnp.float32),
      'weight': jnp.ones((32,)),
  }
  import functools
  step = jax.jit(functools.partial(dqn.train_step, cfg))
  losses = []
  for _ in range(50):
    state, metrics = step(state, batch)
    losses.append(float(metrics['loss']))
  assert losses[-1] < losses[0] * 0.5


def test_mlp_agent_runs():
  from ble_tpu.agents import mlp_agent as mlp
  state = mlp.init(jax.random.PRNGKey(0), obs_dim=16)
  obs = jnp.ones((16,))
  state, action = mlp.step(state, jnp.float32(0.5), obs, jax.random.PRNGKey(1))
  assert int(action) in (0, 1, 2)
  # Params change after a second step (TD update applied).
  p0 = jax.tree.leaves(state.params)[0].copy()
  state, _ = mlp.step(state, jnp.float32(1.0), obs, jax.random.PRNGKey(2))
  p1 = jax.tree.leaves(state.params)[0]
  assert not np.allclose(np.asarray(p0), np.asarray(p1))


@pytest.mark.slow
def test_vae_trainer_smoke():
  reservoir = reservoir_lib.SyntheticWindFieldReservoir()
  params = train_vae.train(reservoir, num_epochs=1, batches_per_epoch=3,
                           batch_size=2, learning_rate=1e-4)
  leaves = jax.tree.leaves(params)
  assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_synthetic_reservoir_incompressible():
  reservoir = reservoir_lib.SyntheticWindFieldReservoir()
  batch = np.asarray(reservoir.get_batch(2, jax.random.PRNGKey(0)))
  assert batch.shape == (2, 21, 21, 10, 9, 2)
  f = batch[0]
  du_d1 = (f[1:-1, 2:, :, :, 0] - f[1:-1, :-2, :, :, 0]) / 2.0
  dv_d0 = (f[2:, 1:-1, :, :, 1] - f[:-2, 1:-1, :, :, 1]) / 2.0
  assert np.abs(du_d1 + dv_d0)[1:-1, 1:-1].max() < 1e-3


def test_renderer_rgb_array():
  from ble_tpu.env import env as env_lib
  import functools
  params = env_lib.EnvParams()
  field_fn = env_lib.make_field_fn('static')
  state, obs = jax.jit(functools.partial(
      env_lib.reset, params=params, field_fn=field_fn))(jax.random.PRNGKey(0))
  r = renderer_lib.MatplotlibRenderer()
  r.reset()
  r.step(state)
  r.step(state)
  img = r.render('rgb_array')
  assert img.ndim == 3 and img.shape[2] == 3
  tb = r.render('tensorboard')
  assert tb.shape == (1,) + img.shape and tb.dtype == np.float32
  assert 0.0 <= tb.min() and tb.max() <= 1.0
  assert 'human' in r.render_modes


def test_config_overrides():
  cfg = learner_lib.TrainConfig()
  cfg2 = config_lib.apply_overrides(
      cfg, ['num_envs=64', 'qrdqn.learning_rate=0.001',
            'replay.batch_size=16', 'use_marco_polo=false'])
  assert cfg2.num_envs == 64
  assert cfg2.qrdqn.learning_rate == 0.001
  assert cfg2.replay.batch_size == 16
  assert cfg2.use_marco_polo is False
  with pytest.raises(ValueError):
    config_lib.apply_overrides(cfg, ['nope=3'])
