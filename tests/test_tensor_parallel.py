"""Tensor-parallel learner demo on a 2x4 CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ble_tpu.agents import qrdqn
from ble_tpu.parallel import tensor_parallel as tp


@pytest.mark.slow
def test_tp_train_step_2x4():
  assert len(jax.devices()) == 8
  mesh = tp.make_2d_mesh(2, 4)
  config = qrdqn.QrDqnConfig(num_layers=4, hidden_units=64, num_atoms=11,
                             learning_rate=1e-3)
  init_fn, step_fn = tp.build_tp_train_step(mesh, config, obs_dim=32)
  state = init_fn(jax.random.PRNGKey(0))

  # Kernel of an even Dense layer is sharded over the model axis.
  kernel = state.params['params']['Dense_0']['kernel']
  assert len(kernel.sharding.device_set) >= 4

  rng = np.random.RandomState(0)
  batch = {
      'obs': jnp.asarray(rng.randn(16, 32), jnp.float32),
      'action': jnp.asarray(rng.randint(0, 3, 16)),
      'n_step_reward': jnp.asarray(rng.rand(16), jnp.float32),
      'bootstrap_discount': jnp.zeros((16,)),
      'next_obs': jnp.asarray(rng.randn(16, 32), jnp.float32),
      'weight': jnp.ones((16,)),
  }
  losses = []
  for _ in range(10):
    state, metrics = step_fn(state, batch)
    losses.append(float(metrics['loss']))
  assert np.isfinite(losses).all()
  assert losses[-1] < losses[0]
