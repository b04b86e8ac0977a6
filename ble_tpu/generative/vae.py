"""Wind-field VAE: stream-function decoder producing incompressible winds.

Same architecture family as the reference ``generative/vae.py:107-224``
(which defines the `offlineskies22` checkpoint format): a 3x1000 MLP maps
64 latents to 7x7 stream functions per (pressure, time) slice, which are
bilinearly upsampled and differentiated (curl) into divergence-free (u, v)
fields on the 21x21 grid. Batched decoding (one latent per env) is a
single jit'd apply -- the MXU does the MLP for thousands of envs at once.

Parameter layout matches flax msgpack checkpoints of the reference decoder
so real `offlineskies22` weights can be restored if the blob is available
(it is not shipped with the reference checkout; see models/loader).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ble_tpu.env import wind_field

NUM_LATENTS = 64
_HIDDEN = 1000
_NUM_HIDDEN_LAYERS = 3
_FLOW_WIDTH = 7  # Small stream functions keep the output field smooth.


def _num_flow_fields() -> int:
  return wind_field.PRESSURE_SLICES * wind_field.TIME_SLICES


class Decoder(nn.Module):
  """Latents -> (21, 21, 10, 9, 2) wind grid."""

  @nn.compact
  def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
    for _ in range(_NUM_HIDDEN_LAYERS):
      z = nn.relu(nn.Dense(_HIDDEN)(z))
    z = nn.Dense(_FLOW_WIDTH * _FLOW_WIDTH * _num_flow_fields())(z)

    psi = z.reshape(z.shape[:-1] + (_FLOW_WIDTH, _FLOW_WIDTH,
                                    _num_flow_fields()))
    # Upsample with a one-pixel halo so the finite differences below never
    # touch the boundary.
    n = wind_field.LATLNG_SLICES + 2
    psi = jax.image.resize(psi, psi.shape[:-3] + (n, n, psi.shape[-1]),
                           method='linear')

    # Incompressible field from the stream function: (u, v) = curl(psi).
    axis_y = psi.ndim - 3
    axis_x = psi.ndim - 2
    dpsi_dy = (jnp.roll(psi, -1, axis=axis_y) -
               jnp.roll(psi, 1, axis=axis_y)) / 2.0
    dpsi_dx = (jnp.roll(psi, -1, axis=axis_x) -
               jnp.roll(psi, 1, axis=axis_x)) / 2.0
    inner = (slice(None),) * (psi.ndim - 3) + (slice(1, -1), slice(1, -1))
    dpsi_dy = dpsi_dy[inner]
    dpsi_dx = dpsi_dx[inner]

    grid = psi.shape[:-3] + (wind_field.LATLNG_SLICES,
                             wind_field.LATLNG_SLICES,
                             wind_field.PRESSURE_SLICES,
                             wind_field.TIME_SLICES)
    u = dpsi_dy.reshape(grid)
    v = -dpsi_dx.reshape(grid)
    return jnp.stack([u, v], axis=-1)


def _squash(x: jnp.ndarray, cap: float = 50.0) -> jnp.ndarray:
  """Saturates inputs to [-1, 1] (reference vae.py:107-113)."""
  s = jnp.sign(x)
  a = jnp.abs(x)
  return s * a / (cap + a)


class Encoder(nn.Module):
  """Wind grid -> latent (mean, logvar)."""

  @nn.compact
  def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    flat = x.reshape(x.shape[:-5] + (-1,)) if x.ndim > 5 else x.reshape(-1)
    x = _squash(flat)
    for _ in range(_NUM_HIDDEN_LAYERS):
      x = nn.relu(nn.Dense(_HIDDEN)(x))
    mean = nn.Dense(NUM_LATENTS, name='mean')(x)
    logvar = nn.Dense(NUM_LATENTS, name='logvar')(x)
    return mean, logvar


class WindFieldVAE(nn.Module):
  """Full VAE with reparameterized latents and a learned output sigma."""
  reparameterize: bool = True

  def setup(self):
    self.encoder = Encoder()
    self.decoder = Decoder()
    self.sigma = self.variable('params', 'sigma', lambda: jnp.float32(1.0))

  def __call__(self, x, z_rng):
    mean, logvar = self.encoder(x)
    if self.reparameterize:
      std = jnp.exp(0.5 * logvar)
      z = mean + jax.random.normal(z_rng, logvar.shape) * std
    else:
      z = mean
    y = self.decoder(z)
    return y, (mean, logvar), self.sigma.value

  def generate(self, z):
    return self.decoder(z)


def init_decoder_params(key: jax.Array):
  """Deterministic decoder init used when no trained blob is available."""
  return Decoder().init(key, jnp.zeros((NUM_LATENTS,)))


def sample_field(params, key: jax.Array) -> jnp.ndarray:
  """z ~ N(0, I) -> decoded grid (reference generative_wind_field.py:52-62)."""
  z = jax.random.normal(key, (NUM_LATENTS,))
  return Decoder().apply(params, z)
