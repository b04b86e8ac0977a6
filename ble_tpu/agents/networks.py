"""Policy/value networks (reference agents/networks.py:27-98).

Batch-first flax modules: the reference flattens a single observation per
call (Dopamine convention, networks.py:60,83); here every module maps
(..., 1099) -> per-action outputs so actor batches and learner batches run
on the MXU without reshaping tricks.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

NUM_ATOMS = 51
HIDDEN_UNITS = 600
NUM_LAYERS = 8


class MLPNetwork(nn.Module):
  """num_layers x hidden MLP -> Q-values (reference networks.py:27-60)."""
  num_actions: int = 3
  num_layers: int = NUM_LAYERS
  hidden_units: int = HIDDEN_UNITS

  @nn.compact
  def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
    kernel_init = jax.nn.initializers.glorot_uniform()
    x = x.astype(jnp.float32)
    for _ in range(self.num_layers - 1):
      x = nn.relu(nn.Dense(self.hidden_units, kernel_init=kernel_init)(x))
    return nn.Dense(self.num_actions, kernel_init=kernel_init)(x)


class LstmQuantileNetwork(nn.Module):
  """Recurrent quantile network (reference acme_utils.py:100-157 R2D2
  variant: torso MLP -> LSTM -> duelling head). Call with an explicit
  carry; use `initial_state` for episode starts.

  `duelling` mirrors the reference's DuellingMLP head
  (acme_utils.py:126-142): value and advantage streams combined as
  q = V + A - mean_a(A), here per quantile atom."""
  num_actions: int = 3
  num_atoms: int = NUM_ATOMS
  torso_layers: int = 2
  hidden_units: int = HIDDEN_UNITS
  lstm_units: int = 256
  duelling: bool = True

  @nn.compact
  def __call__(self, carry, x: jnp.ndarray):
    kernel_init = nn.initializers.variance_scaling(
        scale=1.0 / jnp.sqrt(3.0), mode='fan_in', distribution='uniform')
    x = x.astype(jnp.float32)
    for _ in range(self.torso_layers):
      x = nn.relu(nn.Dense(self.hidden_units, kernel_init=kernel_init)(x))
    carry, x = nn.OptimizedLSTMCell(self.lstm_units)(carry, x)
    if self.duelling:
      h = nn.relu(nn.Dense(self.lstm_units, kernel_init=kernel_init)(x))
      value = nn.Dense(self.num_atoms, kernel_init=kernel_init)(h)
      adv = nn.Dense(self.num_actions * self.num_atoms,
                     kernel_init=kernel_init)(h)
      adv = adv.reshape(adv.shape[:-1] + (self.num_actions, self.num_atoms))
      logits = (value[..., None, :] + adv -
                jnp.mean(adv, axis=-2, keepdims=True))
    else:
      x = nn.Dense(self.num_actions * self.num_atoms,
                   kernel_init=kernel_init)(x)
      logits = x.reshape(x.shape[:-1] + (self.num_actions, self.num_atoms))
    q_values = jnp.mean(logits, axis=-1)
    return carry, (q_values, logits)

  def initial_state(self, rng, batch_shape=()):
    # An LSTM carry is (c, h); flax initializes both to zeros. Built
    # directly because initialize_carry needs a bound module scope.
    del rng
    zeros = jnp.zeros(batch_shape + (self.lstm_units,), jnp.float32)
    return (zeros, zeros)


class QuantileNetwork(nn.Module):
  """MLP -> (num_actions, num_atoms) quantile logits
  (reference networks.py:63-98)."""
  num_actions: int = 3
  num_layers: int = NUM_LAYERS
  hidden_units: int = HIDDEN_UNITS
  num_atoms: int = NUM_ATOMS

  @nn.compact
  def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    kernel_init = nn.initializers.variance_scaling(
        scale=1.0 / jnp.sqrt(3.0), mode='fan_in', distribution='uniform')
    x = x.astype(jnp.float32)
    for _ in range(self.num_layers - 1):
      x = nn.relu(nn.Dense(self.hidden_units, kernel_init=kernel_init)(x))
    x = nn.Dense(self.num_actions * self.num_atoms, kernel_init=kernel_init)(x)
    logits = x.reshape(x.shape[:-1] + (self.num_actions, self.num_atoms))
    q_values = jnp.mean(logits, axis=-1)
    return q_values, logits
