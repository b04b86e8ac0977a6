"""Agent interface and registry.

TPU-native counterpart of the reference agent layer
(``agents/agent.py:33-162``, ``agents/agent_registry.py:40-75``). Two
complementary interfaces:

  - the FUNCTIONAL interface every policy implements:
    `policy(agent_state, observation, key) -> (agent_state, action)` as
    pure jnp over (possibly batched) observations. This is what the
    vectorized harness scans over.
  - the stateful `Agent` wrapper mirroring the reference's
    begin_episode/step/end_episode API for host-side episode loops and
    API parity.
"""

import abc
import enum
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


class AgentMode(enum.Enum):
  TRAIN = 'train'
  EVAL = 'eval'


class Agent(abc.ABC):
  """Stateful agent API (reference agents/agent.py:33-146)."""

  def __init__(self, num_actions: int, observation_shape: Sequence[int]):
    self._num_actions = num_actions
    self._observation_shape = tuple(observation_shape)
    self._mode = AgentMode.TRAIN

  def get_name(self) -> str:
    return type(self).__name__

  @abc.abstractmethod
  def begin_episode(self, observation) -> int:
    ...

  @abc.abstractmethod
  def step(self, reward: float, observation) -> int:
    ...

  @abc.abstractmethod
  def end_episode(self, reward: float, terminal: bool = True) -> None:
    ...

  def set_mode(self, mode: AgentMode) -> None:
    self._mode = mode

  def save_checkpoint(self, checkpoint_dir: str, iteration: int) -> None:
    pass

  def load_checkpoint(self, checkpoint_dir: str, iteration: int) -> None:
    pass

  def reload_latest_checkpoint(self, checkpoint_dir: str) -> int:
    return -1


# --- Registry (reference agent_registry.py) ---

_REGISTRY: Dict[str, Callable[..., Agent]] = {}


def register(name: str):
  def deco(ctor):
    _REGISTRY[name] = ctor
    return ctor
  return deco


def available_agents():
  return sorted(_REGISTRY)


def create_agent(name: str, num_actions: int,
                 observation_shape: Sequence[int], **kwargs) -> Agent:
  if name not in _REGISTRY:
    raise ValueError(
        f'Unknown agent {name!r}; available: {available_agents()}')
  return _REGISTRY[name](num_actions=num_actions,
                         observation_shape=observation_shape, **kwargs)


class FunctionalAgent(Agent):
  """Adapts a pure `policy(state, obs, key) -> (state, action)` function to
  the stateful Agent API."""

  def __init__(self, num_actions: int, observation_shape: Sequence[int],
               init_fn: Callable[[jax.Array], Any],
               policy_fn: Callable[[Any, jnp.ndarray, jax.Array],
                                   Tuple[Any, jnp.ndarray]],
               seed: Optional[int] = None):
    super().__init__(num_actions, observation_shape)
    self._init_fn = init_fn
    self._policy_fn = jax.jit(policy_fn)
    self._key = jax.random.PRNGKey(0 if seed is None else seed)
    self._state = None

  def begin_episode(self, observation) -> int:
    self._key, init_key = jax.random.split(self._key)
    self._state = self._init_fn(init_key)
    return self._act(observation)

  def step(self, reward: float, observation) -> int:
    del reward
    return self._act(observation)

  def end_episode(self, reward: float, terminal: bool = True) -> None:
    pass

  def _act(self, observation) -> int:
    self._key, act_key = jax.random.split(self._key)
    self._state, action = self._policy_fn(self._state,
                                          jnp.asarray(observation), act_key)
    return int(action)
