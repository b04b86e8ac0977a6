"""Gymnasium-compatible single-env wrapper.

Drop-in counterpart of the reference ``env/balloon_env.py:106-300`` /
``env/gym.py``: a stateful `BalloonEnv` class with the classic
step/reset/seed/render API around the pure functional core (env.py). The
vectorized paths don't use this; it exists for API parity and notebook
ergonomics. Registered as `BalloonLearningEnvironment-v0` via
`register_env()`.
"""

import functools
import time
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import numpy as np

from ble_tpu.env import balloon as balloon_lib
from ble_tpu.env import env as env_lib

try:
  import gymnasium as gym
  _GYM = True
except ImportError:  # pragma: no cover
  _GYM = False


class BalloonEnv(gym.Env if _GYM else object):
  """Station-keeping environment, gym API (reference balloon_env.py:106)."""

  metadata = {'render.modes': []}

  def __init__(self,
               *,
               station_keeping_radius_km: float = 50.0,
               params: Optional[env_lib.EnvParams] = None,
               field_fn: Optional[Callable] = None,
               wind_field: str = 'generative',
               seed: Optional[int] = None,
               renderer=None):
    if params is None:
      params = env_lib.EnvParams(
          station_keeping_radius_km=station_keeping_radius_km)
    self._params = params
    if field_fn is None:
      if wind_field == 'generative':
        from ble_tpu.models import loader
        field_fn = env_lib.make_field_fn('generative',
                                         loader.load_offlineskies22())
      else:
        field_fn = env_lib.make_field_fn('static')
    self._reset_fn = jax.jit(functools.partial(env_lib.reset, params=params,
                                               field_fn=field_fn))
    self._step_fn = jax.jit(functools.partial(env_lib.step, params))
    self._renderer = renderer
    if renderer is not None:
      self.metadata = {'render.modes': renderer.render_modes}
    self.seed(seed if seed is not None else int(time.time() * 1e6))
    self.reset()

  def seed(self, seed: int) -> None:
    self._rng = jax.random.PRNGKey(seed)

  def reset(self, *, seed: Optional[int] = None, options=None):
    """Gymnasium API: returns (observation, info).

    (The reference targets gym 0.21's `reset() -> obs`; gymnasium is the
    maintained successor and its 2-tuple is what `gym.make` checks.)
    """
    del options
    if seed is not None:
      self.seed(seed)
    self._rng, arena_rng = jax.random.split(self._rng)
    self._state, obs = self._reset_fn(arena_rng)
    if self._renderer is not None:
      self._renderer.reset()
      self._renderer.step(self._state)
    return np.asarray(obs), {}

  def step(self, action: int
           ) -> Tuple[np.ndarray, float, bool, bool, Mapping[str, Any]]:
    """Gymnasium API: (obs, reward, terminated, truncated, info).

    `terminated` mirrors the reference's `is_done` (power/burst/zero-
    pressure, balloon_env.py:157-190); episode truncation at 960 steps is
    the eval harness's job on both sides, so `truncated` is always False.
    """
    self._state, obs, reward, done, info = self._step_fn(self._state,
                                                         int(action))
    if self._renderer is not None:
      self._renderer.step(self._state)
    info = {k: np.asarray(v).item() for k, v in info.items()}
    return np.asarray(obs), float(reward), bool(done), False, info

  def render(self, mode: str = 'human'):
    if self._renderer is None:
      return None
    return self._renderer.render(mode)

  def close(self) -> None:
    pass

  @property
  def action_space(self):
    return gym.spaces.Discrete(env_lib.NUM_ACTIONS)

  @property
  def observation_space(self):
    low = np.zeros(env_lib.OBSERVATION_DIM, np.float32)
    high = np.ones(env_lib.OBSERVATION_DIM, np.float32)
    low[[3, 4, 5, 6]] = -1.0
    low[15] = 1.0
    high[15] = np.inf
    return gym.spaces.Box(low=low, high=high)

  @property
  def reward_range(self) -> Tuple[float, float]:
    return (0.0, 1.0)

  def get_simulator_state(self) -> env_lib.EnvState:
    """The full checkpointable simulator state (balloon_arena.py:204-207)."""
    return self._state

  def set_simulator_state(self, state: env_lib.EnvState) -> None:
    self._state = state

  def get_balloon_state(self) -> balloon_lib.BalloonState:
    return self._state.balloon

  def __str__(self) -> str:
    return 'BalloonEnv'


def register_env() -> None:
  """Registers BalloonLearningEnvironment-v0 (reference env/gym.py:20)."""
  if not _GYM:
    raise ImportError('gymnasium is required for registration')
  try:
    gym.register(id='BalloonLearningEnvironment-v0',
                 entry_point='ble_tpu.env.gym_env:BalloonEnv')
  except gym.error.Error:
    pass  # Already registered.


# Eager registration on import: the reference registered at install time
# via a `gym.envs` entry point (reference setup.py:87-90); gymnasium
# dropped that plugin mechanism, so importing this module is the
# registration point (documented in pyproject.toml).
if _GYM:
  register_env()
