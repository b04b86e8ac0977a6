"""Random-walk exploration agent (pressure-target drift), vectorized.

Counterpart of the reference ``agents/random_walk_agent.py``: a target
pressure performs a Gaussian random walk (stddev proportional to episode
time elapsed, matching random_walk_agent.py:80-91) and the policy chases
it with 100 Pa hysteresis. Pure pytree state so thousands of instances run
under vmap (this is also the exploratory policy inside MarcoPolo).
"""

import jax
import jax.numpy as jnp
from flax import struct

from ble_tpu.agents import base
from ble_tpu.env import features as features_lib
from ble_tpu.env import safety
from ble_tpu.utils import constants

HYSTERESIS_PA = 100.0
STDDEV = 0.1666  # ~10 Pa/min (random_walk_agent.py:39).


@struct.dataclass
class RandomWalkState:
  target_pressure: jnp.ndarray
  time_elapsed_s: jnp.ndarray


def init(key: jax.Array) -> RandomWalkState:
  """Fresh target pressure (random_walk_agent.py:58-60; sample_pressure
  without atmosphere uses the conservative 11400 Pa max)."""
  target = jax.random.uniform(key, (), minval=6500.0, maxval=11400.0)
  return RandomWalkState(target_pressure=target,
                         time_elapsed_s=jnp.float32(0.0))


def select_action(state: RandomWalkState, observation) -> jnp.ndarray:
  balloon_pressure = features_lib.parse(observation).balloon_pressure
  return jnp.where(
      balloon_pressure - HYSTERESIS_PA > state.target_pressure, safety.UP,
      jnp.where(balloon_pressure + HYSTERESIS_PA < state.target_pressure,
                safety.DOWN, safety.STAY))


def step(state: RandomWalkState, observation, key: jax.Array):
  """Drifts the target and picks an action (random_walk_agent.py:80-91)."""
  elapsed = state.time_elapsed_s + constants.AGENT_TIME_STEP_SECONDS
  target = (state.target_pressure +
            elapsed * STDDEV * jax.random.normal(key))
  new_state = RandomWalkState(target_pressure=target, time_elapsed_s=elapsed)
  return new_state, select_action(new_state, observation)


@base.register('random_walk')
class RandomWalkAgent(base.FunctionalAgent):

  def __init__(self, num_actions, observation_shape, seed=None):
    def policy(state, obs, key):
      if state is None:
        raise ValueError('begin_episode must be called first')
      return step(state, obs, key)
    super().__init__(num_actions, observation_shape, init_fn=init,
                     policy_fn=policy, seed=seed)

  def begin_episode(self, observation) -> int:
    self._key, init_key = jax.random.split(self._key)
    self._state = init(init_key)
    # First action uses the fresh target without drift
    # (random_walk_agent.py:75-78).
    return int(select_action(self._state, jnp.asarray(observation)))


@base.register('random')
class RandomAgent(base.FunctionalAgent):
  """Uniform random policy (reference agents/agent.py:149-162)."""

  def __init__(self, num_actions, observation_shape, seed=None):
    def policy(state, obs, key):
      return state, jax.random.randint(key, (), 0, num_actions)
    super().__init__(num_actions, observation_shape,
                     init_fn=lambda key: (), policy_fn=policy, seed=seed)
