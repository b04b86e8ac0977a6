"""Perciatelli44: the frozen Nature-paper QR-DQN policy.

Counterpart of the reference ``agents/perciatelli44.py:37-79``, but
running natively on TPU: the converted flax weights (see
models/convert_perciatelli44.py) drive our QuantileNetwork, so inference
is one batched MXU matmul stack instead of a TF1 session per step.
"""

from typing import Optional, Sequence

import jax.numpy as jnp

from ble_tpu.agents import base
from ble_tpu.agents import networks
from ble_tpu.models import loader


def make_policy(params):
  """Returns a pure `obs -> action` function over (..., 1099) batches."""
  net = networks.QuantileNetwork()

  def policy(observation: jnp.ndarray) -> jnp.ndarray:
    q_values, _ = net.apply(params, observation)
    return jnp.argmax(q_values, axis=-1)

  return policy


@base.register('perciatelli44')
class Perciatelli44(base.FunctionalAgent):

  def __init__(self, num_actions: int, observation_shape: Sequence[int],
               seed: Optional[int] = None, params=None):
    if num_actions != 3:
      raise ValueError('Perciatelli44 only supports 3 actions.')
    if list(observation_shape) != [1099]:
      raise ValueError('Perciatelli44 only supports 1099 dimensional input.')
    params = params if params is not None else loader.load_perciatelli44()
    policy = make_policy(params)
    super().__init__(
        num_actions, observation_shape,
        init_fn=lambda key: (),
        policy_fn=lambda state, obs, key: (state, policy(obs)),
        seed=seed)
