"""Wind-field training datasets ("reservoirs").

Counterpart of the reference ``generative/wind_field_reservoir.py`` (ABC)
and ``dataset_wind_field_reservoir.py`` (200 pickle shards named
`batch%04d.pickle`). Adds a synthetic reservoir so the VAE trainer is
runnable without the proprietary offline-winds dataset.
"""

import abc
import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ble_tpu.env import wind_field


class WindFieldReservoir(abc.ABC):
  """Supplies batches of (21, 21, 10, 9, 2) wind fields."""

  @abc.abstractmethod
  def get_batch(self, batch_size: int, key: jax.Array) -> jnp.ndarray:
    ...

  @abc.abstractmethod
  def get_eval_batch(self, batch_size: int) -> jnp.ndarray:
    ...


class DatasetWindFieldReservoir(WindFieldReservoir):
  """In-memory dataset loaded from pickle shards
  (reference dataset_wind_field_reservoir.py:28-81)."""

  def __init__(self, data_path: str, num_shards: int = 200,
               eval_batch_size: int = 128):
    shards = []
    for i in range(num_shards):
      path = os.path.join(data_path, f'batch{i:04d}.pickle')
      if not os.path.exists(path):
        break
      with open(path, 'rb') as f:
        shards.append(pickle.load(f))
    if not shards:
      raise FileNotFoundError(f'No batch****.pickle shards in {data_path}')
    self.data = np.concatenate(shards, axis=0)
    self._eval_batch_size = eval_batch_size

  def get_batch(self, batch_size: int, key: jax.Array) -> jnp.ndarray:
    idx = jax.random.choice(key, self.data.shape[0] - self._eval_batch_size,
                            (batch_size,))
    return jnp.asarray(self.data[np.asarray(idx)])

  def get_eval_batch(self, batch_size: int) -> jnp.ndarray:
    return jnp.asarray(self.data[-batch_size:])


class SyntheticWindFieldReservoir(WindFieldReservoir):
  """Procedurally generated incompressible wind fields for smoke training.

  Draws random smooth stream functions (low-frequency Fourier modes per
  pressure/time slice) and differentiates them, giving fields with the
  same incompressibility structure the VAE decoder produces.
  """

  def __init__(self, seed: int = 0):
    self._base_key = jax.random.PRNGKey(seed)

  def _sample(self, key: jax.Array) -> jnp.ndarray:
    n = wind_field.LATLNG_SLICES + 2
    num_ff = wind_field.PRESSURE_SLICES * wind_field.TIME_SLICES
    modes = jax.random.normal(key, (4, 4, num_ff))
    fx = jnp.arange(n)[:, None] / n
    fy = jnp.arange(n)[None, :] / n
    psi = jnp.zeros((n, n, num_ff))
    for kx in range(4):
      for ky in range(4):
        basis = (jnp.sin(2 * jnp.pi * (kx + 1) * fx) *
                 jnp.sin(2 * jnp.pi * (ky + 1) * fy))
        psi = psi + modes[kx, ky] * basis[:, :, None] * 40.0 / (1 + kx + ky)
    du = (jnp.roll(psi, -1, 0) - jnp.roll(psi, 1, 0))[1:-1, 1:-1] / 2.0
    dv = (jnp.roll(psi, -1, 1) - jnp.roll(psi, 1, 1))[1:-1, 1:-1] / 2.0
    shape = (wind_field.LATLNG_SLICES, wind_field.LATLNG_SLICES,
             wind_field.PRESSURE_SLICES, wind_field.TIME_SLICES)
    return jnp.stack([du.reshape(shape), -dv.reshape(shape)], axis=-1)

  def get_batch(self, batch_size: int, key: jax.Array) -> jnp.ndarray:
    keys = jax.random.split(key, batch_size)
    return jax.vmap(self._sample)(keys)

  def get_eval_batch(self, batch_size: int) -> jnp.ndarray:
    keys = jax.random.split(self._base_key, batch_size)
    return jax.vmap(self._sample)(keys)
