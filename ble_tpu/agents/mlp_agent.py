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


# --- Vectorized online learner (for the training harness) ---------------
#
# The reference trains the MLP agent through the generic train.py loop:
# `agent.step(reward, obs)` selects a_t and TD-updates on the previous
# transition (mlp_agent.py:61-90). The vectorized equivalent keeps one
# shared network plus per-env "pending transition" lanes
# (s_{t-1}, a_{t-1}, r_{t-1}); when a_t is chosen at s_t the pending SARSA
# target r + gamma * Q(s_t, a_t) becomes computable and one batched SGD
# step runs over all valid lanes.


@struct.dataclass
class MlpOnlineState:
  params: Any
  opt_state: Any
  p_obs: jnp.ndarray  # (E, D)
  p_action: jnp.ndarray  # (E,)
  p_reward: jnp.ndarray  # (E,)
  p_boot: jnp.ndarray  # (E,): gamma, or 0 if the pending step was terminal.
  p_valid: jnp.ndarray  # (E,) bool


def online_init(key: jax.Array, obs_dim: int,
                num_envs: int) -> MlpOnlineState:
  params = _NETWORK.init(key, jnp.zeros((obs_dim,)))
  return MlpOnlineState(
      params=params, opt_state=_OPT.init(params),
      p_obs=jnp.zeros((num_envs, obs_dim)),
      p_action=jnp.zeros((num_envs,), jnp.int32),
      p_reward=jnp.zeros((num_envs,)),
      p_boot=jnp.zeros((num_envs,)),
      p_valid=jnp.zeros((num_envs,), jnp.bool_))


def online_select(params, obs, key, epsilon=0.0):
  q = _NETWORK.apply(params, obs)
  greedy = jnp.argmax(q, axis=-1)
  if isinstance(epsilon, float) and epsilon == 0.0:
    return greedy
  explore_key, action_key = jax.random.split(key)
  random_actions = jax.random.randint(action_key, greedy.shape, 0,
                                      q.shape[-1])
  explore = jax.random.uniform(explore_key, greedy.shape) < epsilon
  return jnp.where(explore, random_actions, greedy)


def online_train(state: MlpOnlineState, obs, action, reward, done, active,
                 grad_transform=None):
  """One batched SARSA step on the pending transitions; rotates lanes.

  Args:
    obs: (E, D) the observations a_t was selected at (= pending next-state).
    action: (E,) a_t.
    reward: (E,) r_t from stepping a_t.
    done: (E,) terminal after this step.
    active: (E,) env was live at this step.
  Returns (new_state, mean_loss).
  """
  def loss_fn(params):
    q_prev = jnp.take_along_axis(
        _NETWORK.apply(params, state.p_obs), state.p_action[:, None],
        axis=-1)[:, 0]
    q_next = jax.lax.stop_gradient(
        jnp.take_along_axis(_NETWORK.apply(params, obs), action[:, None],
                            axis=-1)[:, 0])
    target = state.p_reward + state.p_boot * q_next
    per_env = (q_prev - target) ** 2
    w = state.p_valid.astype(jnp.float32)
    return jnp.sum(per_env * w) / jnp.maximum(jnp.sum(w), 1.0)

  loss, grads = jax.value_and_grad(loss_fn)(state.params)
  if grad_transform is not None:
    grads = grad_transform(grads)
  updates, opt_state = _OPT.update(grads, state.opt_state, state.params)
  params = optax.apply_updates(state.params, updates)

  return state.replace(
      params=params, opt_state=opt_state,
      p_obs=obs, p_action=action, p_reward=reward,
      p_boot=jnp.where(done, 0.0, GAMMA),
      p_valid=active), loss


def online_invalidate(state: MlpOnlineState, mask) -> MlpOnlineState:
  """Drops pending lanes for envs reset at a chunk boundary."""
  return state.replace(p_valid=jnp.logical_and(state.p_valid,
                                               jnp.logical_not(mask)))


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
