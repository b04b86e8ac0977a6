"""Trained-model loading (reference models/models.py:33-130).

Two artifacts exist upstream:
  - `offlineskies22_decoder.msgpack`: flax msgpack of the VAE wind decoder;
  - `perciatelli44.pb`: frozen TF1 graph of the Nature-paper QR-DQN.

Neither blob ships with the reference checkout used here (they are listed
as missing large files), so loading is resolution-with-fallback:

  offlineskies22: explicit path -> $BLE_TPU_MODELS dir -> packaged file ->
    DETERMINISTIC random decoder init (seed 0). The fallback yields
    statistically plausible incompressible wind fields (same architecture,
    untrained), keeping every pipeline runnable; swap in the real msgpack
    for distribution-exact winds.

  perciatelli44: explicit path -> $BLE_TPU_MODELS dir -> error with
    conversion instructions (convert_perciatelli44.py turns the TF1
    GraphDef into flax msgpack offline).
"""

import os
from typing import Optional

import jax

_OFFLINESKIES_FILENAME = 'offlineskies22_decoder.msgpack'
_PERCIATELLI_FILENAME = 'perciatelli44.msgpack'


def _candidate_paths(filename: str, explicit: Optional[str]):
  if explicit:
    yield explicit
  env_dir = os.environ.get('BLE_TPU_MODELS')
  if env_dir:
    yield os.path.join(env_dir, filename)
  yield os.path.join(os.path.dirname(__file__), filename)


def load_offlineskies22(path: Optional[str] = None):
  """Returns flax decoder params (reference models.py:33-80)."""
  import flax

  from ble_tpu.generative import vae

  for candidate in _candidate_paths(_OFFLINESKIES_FILENAME, path):
    if os.path.exists(candidate):
      with open(candidate, 'rb') as f:
        return flax.serialization.msgpack_restore(f.read())
  # Deterministic fallback: untrained decoder, fixed seed.
  return vae.init_decoder_params(jax.random.PRNGKey(0))


def load_perciatelli44(path: Optional[str] = None):
  """Returns flax QuantileNetwork params converted from perciatelli44.pb."""
  import flax

  for candidate in _candidate_paths(_PERCIATELLI_FILENAME, path):
    if os.path.exists(candidate):
      with open(candidate, 'rb') as f:
        return flax.serialization.msgpack_restore(f.read())
  raise FileNotFoundError(
      'perciatelli44.msgpack not found. Obtain perciatelli44.pb and run '
      'python -m ble_tpu.models.convert_perciatelli44 <pb> <out.msgpack> '
      'once, then set $BLE_TPU_MODELS.')
