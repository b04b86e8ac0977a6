"""Online SARSA-style MLP agent (reference agents/mlp_agent.py:61-147).

A tiny on-policy baseline: one-step TD targets from consecutive
transitions, SGD updates after every step, vectorizable over envs.
"""

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ble_tpu.agents import base
from ble_tpu.agents import networks


@struct.dataclass
class MLPAgentState:
  params: Any
  opt_state: Any
  last_obs: jnp.ndarray
  last_action: jnp.ndarray
  has_last: jnp.ndarray  # bool


_NETWORK = networks.MLPNetwork(num_actions=3, num_layers=1, hidden_units=256)
_OPT = optax.sgd(3e-4)
GAMMA = 0.9


def init(key: jax.Array, obs_dim: int = 1099) -> MLPAgentState:
  params = _NETWORK.init(key, jnp.zeros((obs_dim,)))
  return MLPAgentState(params=params, opt_state=_OPT.init(params),
                       last_obs=jnp.zeros((obs_dim,)),
                       last_action=jnp.int32(0),
                       has_last=jnp.bool_(False))


def _td_update(state: MLPAgentState, reward, obs, next_action):
  """SARSA TD(0) update on the previous transition."""
  def loss_fn(params):
    q_prev = _NETWORK.apply(params, state.last_obs)[state.last_action]
    q_next = jax.lax.stop_gradient(
        _NETWORK.apply(params, obs)[next_action])
    target = reward + GAMMA * q_next
    return (q_prev - target) ** 2

  grads = jax.grad(loss_fn)(state.params)
  grads = jax.tree.map(
      lambda g: jnp.where(state.has_last, g, jnp.zeros_like(g)), grads)
  updates, opt_state = _OPT.update(grads, state.opt_state, state.params)
  return state.replace(params=optax.apply_updates(state.params, updates),
                       opt_state=opt_state)


def step(state: MLPAgentState, reward, obs, key) -> tuple:
  q = _NETWORK.apply(state.params, obs)
  action = jnp.argmax(q, axis=-1)
  state = _td_update(state, reward, obs, action)
  state = state.replace(last_obs=obs, last_action=action,
                        has_last=jnp.bool_(True))
  return state, action


@base.register('mlp')
class MLPAgent(base.FunctionalAgent):

  def __init__(self, num_actions: int, observation_shape: Sequence[int],
               seed: Optional[int] = None):
    obs_dim = observation_shape[0]

    def policy(state, obs, key):
      return step(state, jnp.float32(0.0), obs, key)

    super().__init__(num_actions, observation_shape,
                     init_fn=lambda key: init(key, obs_dim),
                     policy_fn=policy, seed=seed)

  def step(self, reward: float, observation) -> int:
    self._key, key = jax.random.split(self._key)
    self._state, action = jax.jit(step)(self._state, jnp.float32(reward),
                                        jnp.asarray(observation), key)
    return int(action)
