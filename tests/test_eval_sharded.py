"""Mesh-sharded evaluation + LSTM network tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ble_tpu.agents import networks, station_seeker
from ble_tpu.env import env as env_lib
from ble_tpu.train import eval_lib


@pytest.mark.slow
def test_eval_sharded_over_mesh_matches_unsharded():
  mesh = Mesh(np.asarray(jax.devices()), ('seeds',))
  env_params = env_lib.EnvParams()
  field_fn = env_lib.make_field_fn('static')
  policy_init = lambda key: ()
  policy_step = lambda s, obs, key: (s, station_seeker.pick_action(obs))

  plain = eval_lib.build_eval_fn(env_params, field_fn, policy_init,
                                 policy_step, max_steps=12)
  sharded = eval_lib.build_eval_fn(env_params, field_fn, policy_init,
                                   policy_step, max_steps=12, mesh=mesh)
  seeds = jnp.arange(8, dtype=jnp.int32)
  r_plain = jax.tree.map(np.asarray, plain(seeds))
  r_sharded = jax.tree.map(np.asarray, sharded(seeds))
  # Partitioning changes f32 reassociation slightly; semantic equality only.
  np.testing.assert_allclose(r_plain['cumulative_reward'],
                             r_sharded['cumulative_reward'], rtol=2e-2,
                             atol=0.05)
  np.testing.assert_array_equal(r_plain['final_timestep'],
                                r_sharded['final_timestep'])


def test_lstm_quantile_network():
  net = networks.LstmQuantileNetwork(torso_layers=1, hidden_units=32,
                                     lstm_units=16, num_atoms=11)
  carry = net.initial_state(jax.random.PRNGKey(0), (4,))
  obs = jnp.ones((4, 1099))
  params = net.init(jax.random.PRNGKey(1), carry, obs)
  carry2, (q, logits) = net.apply(params, carry, obs)
  assert q.shape == (4, 3)
  assert logits.shape == (4, 3, 11)
  # Recurrent state actually carries information.
  carry3, (q2, _) = net.apply(params, carry2, obs)
  assert not np.allclose(np.asarray(q), np.asarray(q2))
