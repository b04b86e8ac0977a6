"""MarcoPolo exploration as vectorized pytree state.

Counterpart of the reference ``agents/marco_polo_exploration.py``: with
probability 0.8 an episode is exploratory; within it, a 4-hour RL phase
(80 agent steps) alternates with a 2-hour exploratory phase (40 steps)
whose actions come from the random-walk agent. All state is per-env jnp so
thousands of actors explore independently under vmap.
"""

import jax
import jax.numpy as jnp
from flax import struct

from ble_tpu.agents import random_walk

RL_PHASE_STEPS = 80  # 4 h at 3-minute steps (marco_polo_exploration.py:35).
EXPLORATORY_PHASE_STEPS = 40  # 2 h (marco_polo_exploration.py:36).
EXPLORATORY_EPISODE_PROBABILITY = 0.8  # configs/quantile.gin.


@struct.dataclass
class MarcoPoloState:
  exploratory_episode: jnp.ndarray  # bool
  exploratory_phase: jnp.ndarray  # bool
  phase_steps: jnp.ndarray  # int32
  rw: random_walk.RandomWalkState


def begin_episode(key: jax.Array,
                  probability: float = EXPLORATORY_EPISODE_PROBABILITY
                  ) -> MarcoPoloState:
  """Episode init; episodes always begin in the RL phase
  (marco_polo_exploration.py:58-66)."""
  episode_key, rw_key = jax.random.split(key)
  return MarcoPoloState(
      exploratory_episode=jax.random.uniform(episode_key) <= probability,
      exploratory_phase=jnp.bool_(False),
      phase_steps=jnp.int32(0),
      rw=random_walk.init(rw_key))


def step(state: MarcoPoloState, observation, rl_action, key: jax.Array):
  """Phase bookkeeping + action mixing (marco_polo_exploration.py:68-93).

  Returns (new_state, action).
  """
  phase_steps = state.phase_steps + 1
  expired = jnp.where(state.exploratory_phase,
                      phase_steps >= EXPLORATORY_PHASE_STEPS,
                      phase_steps >= RL_PHASE_STEPS)
  flip = jnp.logical_and(state.exploratory_episode, expired)
  exploratory_phase = jnp.logical_xor(state.exploratory_phase, flip)
  phase_steps = jnp.where(flip, 0, phase_steps)

  # The random-walk agent only advances when queried
  # (marco_polo_exploration.py:88-93).
  rw_next, rw_action = random_walk.step(state.rw, observation, key)
  rw_state = jax.tree.map(
      lambda new, old: jnp.where(exploratory_phase, new, old), rw_next,
      state.rw)

  action = jnp.where(exploratory_phase, rw_action, rl_action)
  return MarcoPoloState(
      exploratory_episode=state.exploratory_episode,
      exploratory_phase=exploratory_phase,
      phase_steps=phase_steps,
      rw=rw_state), action
