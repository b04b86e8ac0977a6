"""DQN learner: n-step MSE TD loss on the MLP Q-network.

Counterpart of the reference's Dopamine `JaxDQNAgent` wrapper
(``agents/dqn_agent.py:32-142``; configs/dqn.gin: 8x600 MLP, gamma=0.993,
n-step 5, Adam lr 2e-6 eps 2e-5, loss mse, epsilon_train 0.01). Shares the
replay/actor machinery with the QR-DQN stack.
"""

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ble_tpu.agents import networks


@struct.dataclass
class DqnConfig:
  num_actions: int = 3
  num_layers: int = networks.NUM_LAYERS
  hidden_units: int = networks.HIDDEN_UNITS
  gamma: float = 0.993
  learning_rate: float = 2e-6
  adam_eps: float = 2e-5
  target_update_period: int = 100
  update_period: int = 4
  min_replay_history: int = 500
  epsilon_train: float = 0.01


@struct.dataclass
class DqnLearnerState:
  params: Any
  target_params: Any
  opt_state: Any
  train_steps: jnp.ndarray


def make_network(config: DqnConfig) -> networks.MLPNetwork:
  return networks.MLPNetwork(num_actions=config.num_actions,
                             num_layers=config.num_layers,
                             hidden_units=config.hidden_units)


def make_optimizer(config: DqnConfig):
  return optax.adam(config.learning_rate, eps=config.adam_eps)


def init(key: jax.Array, config: DqnConfig, obs_dim: int) -> DqnLearnerState:
  params = make_network(config).init(key, jnp.zeros((obs_dim,)))
  return DqnLearnerState(params=params, target_params=params,
                         opt_state=make_optimizer(config).init(params),
                         train_steps=jnp.int32(0))


def select_action(config: DqnConfig, params, obs, key, epsilon=0.0):
  q = make_network(config).apply(params, obs)
  greedy = jnp.argmax(q, axis=-1)
  if isinstance(epsilon, float) and epsilon == 0.0:
    return greedy
  explore_key, action_key = jax.random.split(key)
  random_actions = jax.random.randint(action_key, greedy.shape, 0,
                                      config.num_actions)
  explore = jax.random.uniform(explore_key, greedy.shape) < epsilon
  return jnp.where(explore, random_actions, greedy)


def mse_loss(config: DqnConfig, params, target_params,
             batch: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, Dict]:
  net = make_network(config)
  next_q = net.apply(target_params, batch['next_obs'])
  target = (batch['n_step_reward'] +
            batch['bootstrap_discount'] * jnp.max(next_q, axis=-1))
  target = jax.lax.stop_gradient(target)

  q = net.apply(params, batch['obs'])
  chosen = jnp.take_along_axis(q, batch['action'][:, None], axis=-1)[:, 0]
  per_sample = (chosen - target) ** 2

  w = batch.get('weight', jnp.ones_like(per_sample))
  loss = jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)
  return loss, {'loss': loss, 'mean_q': jnp.mean(chosen),
                'per_sample_loss': jax.lax.stop_gradient(per_sample)}


def train_step(config: DqnConfig, state: DqnLearnerState,
               batch: Dict[str, jnp.ndarray],
               grad_transform=None) -> Tuple[DqnLearnerState, Dict]:
  grads, metrics = jax.grad(
      lambda p: mse_loss(config, p, state.target_params, batch),
      has_aux=True)(state.params)
  if grad_transform is not None:
    grads = grad_transform(grads)
  updates, opt_state = make_optimizer(config).update(grads, state.opt_state,
                                                     state.params)
  params = optax.apply_updates(state.params, updates)
  train_steps = state.train_steps + 1
  sync = (train_steps % config.target_update_period) == 0
  target_params = jax.tree.map(lambda t, p: jnp.where(sync, p, t),
                               state.target_params, params)
  return DqnLearnerState(params=params, target_params=target_params,
                         opt_state=opt_state, train_steps=train_steps), metrics
