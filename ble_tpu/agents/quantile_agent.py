"""Registry agents for the QR-DQN / DQN policies.

Counterpart of the reference ``agents/quantile_agent.py`` /
``agents/dqn_agent.py`` registry entries. Training happens in the
vectorized harness (ble_tpu/train/learner.py); these Agent wrappers act
greedily from learner parameters (freshly initialized, restored from an
orbax checkpoint directory, or -- for `finetune_perciatelli` -- seeded
from the converted Perciatelli44 weights, mirroring
quantile_agent.py:202-254's reload).
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ble_tpu.agents import base
from ble_tpu.agents import dqn as dqn_lib
from ble_tpu.agents import qrdqn as qrdqn_lib


def _restore_params(checkpoint_dir: str):
  # Template-free params extraction: robust to the replay/env shapes the
  # checkpoint was trained with (a full-TrainState StandardRestore against
  # a mismatched template throws opaquely).
  from ble_tpu.train import train_lib
  params, _ = train_lib.restore_latest_learner_params(checkpoint_dir)
  return params


@base.register('quantile')
class QuantileAgent(base.FunctionalAgent):
  """Greedy policy over the quantile network (agents/quantile_agent.py:40)."""

  def __init__(self, num_actions: int, observation_shape: Sequence[int],
               seed: Optional[int] = None, checkpoint_dir: Optional[str] = None,
               params=None, config: Optional[qrdqn_lib.QrDqnConfig] = None):
    config = config or qrdqn_lib.QrDqnConfig(num_actions=num_actions)
    if params is None:
      if checkpoint_dir is not None:
        params = _restore_params(checkpoint_dir)
      else:
        params = qrdqn_lib.init(jax.random.PRNGKey(seed or 0), config,
                                observation_shape[0]).params
    self.params = params
    self.config = config

    def policy(state, obs, key):
      return state, qrdqn_lib.select_action(config, params, obs, None)

    super().__init__(num_actions, observation_shape,
                     init_fn=lambda key: (), policy_fn=policy, seed=seed)


@base.register('finetune_perciatelli')
class FinetunePerciatelliAgent(QuantileAgent):
  """QuantileAgent initialized from the converted Perciatelli44 weights."""

  def __init__(self, num_actions: int, observation_shape: Sequence[int],
               seed: Optional[int] = None,
               checkpoint_dir: Optional[str] = None):
    from ble_tpu.models import loader
    params = loader.load_perciatelli44() if checkpoint_dir is None else None
    super().__init__(num_actions, observation_shape, seed=seed,
                     checkpoint_dir=checkpoint_dir, params=params)


@base.register('dqn')
class DQNAgent(base.FunctionalAgent):
  """Greedy policy over the MLP Q-network (agents/dqn_agent.py:32)."""

  def __init__(self, num_actions: int, observation_shape: Sequence[int],
               seed: Optional[int] = None,
               params=None, config: Optional[dqn_lib.DqnConfig] = None):
    config = config or dqn_lib.DqnConfig(num_actions=num_actions)
    if params is None:
      params = dqn_lib.init(jax.random.PRNGKey(seed or 0), config,
                            observation_shape[0]).params

    def policy(state, obs, key):
      return state, dqn_lib.select_action(config, params, obs, None)

    super().__init__(num_actions, observation_shape,
                     init_fn=lambda key: (), policy_fn=policy, seed=seed)
