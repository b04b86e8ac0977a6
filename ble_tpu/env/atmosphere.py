"""US Standard Atmosphere 1976 with randomized lapse rates, TPU-native.

Functional counterpart of the reference ``env/balloon/standard_atmosphere.py``:
the reference keeps a stateful `Atmosphere` object whose `at_pressure` /
`at_height` walk the 7 atmosphere layers with Python loops
(``standard_atmosphere.py:89-154``). Here the per-reset randomized profile is
a small pytree (`AtmosphereParams`) and the inversions are branchless: all 7
layer candidates are computed and the active one selected with a mask, so the
functions vmap over both balloons and pressure columns.
"""

import jax
import jax.numpy as jnp
from flax import struct

from ble_tpu.ops import pmath

from ble_tpu.utils import constants

# Layer boundaries [m] and the two lapse-rate tables that are blended per
# reset (reference standard_atmosphere.py:66-71).
HEIGHT_TRANSITIONS = (
    -610.0, 17000.0, 21000.0, 32000.0, 47000.0, 51000.0, 71000.0, 85000.0)
LAPSE_RATES_LOW = (-0.007, 0.006, 0.001, 0.0028, 0.0, -0.0028, -0.002)
LAPSE_RATES_HIGH = (-0.0058, 0.005, 0.001, 0.0028, 0.0, -0.0028, -0.002)
BASE_TEMPERATURE = 300.0  # [K]
BASE_PRESSURE = 108870.8213  # [Pa]

_R = constants.DRY_AIR_SPECIFIC_GAS_CONSTANT
_G = constants.GRAVITY


@struct.dataclass
class AtmosphereParams:
  """Per-reset atmosphere profile. All leaves have a trailing layer axis."""
  lapse_rates: jnp.ndarray  # (..., 7)
  temperature_transitions: jnp.ndarray  # (..., 8)
  pressure_transitions: jnp.ndarray  # (..., 8)


def reset(key: jax.Array) -> AtmosphereParams:
  """Samples a new atmosphere (reference standard_atmosphere.py:76-87)."""
  alpha = jax.random.uniform(key)
  return make(alpha)


def make(alpha) -> AtmosphereParams:
  """Builds the profile for a given lapse-rate blend coefficient in [0,1]."""
  low = jnp.asarray(LAPSE_RATES_LOW, jnp.float32)
  high = jnp.asarray(LAPSE_RATES_HIGH, jnp.float32)
  alpha = jnp.asarray(alpha, jnp.float32)[..., None]
  lapse = (1.0 - alpha) * low + alpha * high  # (..., 7)

  heights = jnp.asarray(HEIGHT_TRANSITIONS, jnp.float32)
  dh = heights[1:] - heights[:-1]  # (7,)

  # Temperature transitions: cumulative sum of lapse * layer thickness.
  temps = jnp.concatenate(
      [jnp.full(lapse.shape[:-1] + (1,), BASE_TEMPERATURE),
       BASE_TEMPERATURE + jnp.cumsum(lapse * dh, axis=-1)], axis=-1)

  # Pressure transitions: product of per-layer ratios. For non-zero lapse
  # layers the ratio is (T[i+1]/T[i])^(-g/(R*L)); for the isothermal layer
  # it is exp(-g*dh/(R*T)). (reference standard_atmosphere.py:185-202)
  is_iso = lapse == 0.0
  safe_lapse = jnp.where(is_iso, 1.0, lapse)
  ratio_linear = pmath.powf(temps[..., 1:] / temps[..., :-1],
                            -_G / (_R * safe_lapse))
  ratio_iso = jnp.exp(-_G * dh / (_R * temps[..., 1:]))
  ratios = jnp.where(is_iso, ratio_iso, ratio_linear)
  pressures = BASE_PRESSURE * jnp.concatenate(
      [jnp.ones(lapse.shape[:-1] + (1,)),
       jnp.cumprod(ratios, axis=-1)], axis=-1)

  return AtmosphereParams(
      lapse_rates=lapse,
      temperature_transitions=temps,
      pressure_transitions=pressures)


def _select_layer(mask_upper):
  """Index of the first True layer.

  The masks used here are monotone along the layer axis (pressure
  transitions decrease, height transitions increase), so the first True
  index equals the count of leading False entries -- a sum, which Pallas
  lowers (argmax along an axis does not).
  """
  n = mask_upper.shape[-1]
  return n - jnp.sum(mask_upper.astype(jnp.int32), axis=-1)


def _gather_layer(table, idx):
  """table[..., idx] with broadcasting between table batch dims and idx.

  Implemented as a one-hot masked sum over the (tiny) layer axis: XLA on
  TPU lowers batched-operand gathers to serialized selects, while this is
  a handful of fused VPU multiply-adds.
  """
  n = table.shape[-1]
  onehot = jnp.arange(n) == idx[..., None]  # (..., n)
  return jnp.sum(jnp.where(onehot, table, 0.0), axis=-1)


def at_pressure(params: AtmosphereParams, pressure):
  """(height_m, temperature_K, density) at an ambient pressure.

  Vectorized over leading axes of `pressure`; `params` leaves may broadcast.
  Reference: standard_atmosphere.py:122-154.
  """
  pressure = jnp.asarray(pressure, jnp.float32)
  pt = params.pressure_transitions
  tt = params.temperature_transitions
  lapse = params.lapse_rates
  heights = jnp.asarray(HEIGHT_TRANSITIONS, jnp.float32)

  # Layer i active iff pressure > pt[i+1] (pt decreasing in i).
  idx = _select_layer(pressure[..., None] > pt[..., 1:])

  p0 = _gather_layer(pt, idx)
  t0 = _gather_layer(tt, idx)
  l0 = _gather_layer(lapse, idx)
  h0 = heights[idx]

  is_iso = l0 == 0.0
  safe_l = jnp.where(is_iso, 1.0, l0)
  height_iso = (-_R * t0 / _G) * jnp.log(pressure / p0) + h0
  height_lin = (pmath.powf(pressure / p0, -_R * safe_l / _G) - 1.0) * t0 / safe_l + h0
  height = jnp.where(is_iso, height_iso, height_lin)

  temperature = t0 + l0 * (height - h0)
  density = pressure / (_R * temperature)
  return height, temperature, density


def at_height(params: AtmosphereParams, height_m):
  """(pressure_Pa, temperature_K, density) at a geopotential height.

  Reference: standard_atmosphere.py:89-120.
  """
  height_m = jnp.asarray(height_m, jnp.float32)
  pt = params.pressure_transitions
  tt = params.temperature_transitions
  lapse = params.lapse_rates
  heights = jnp.asarray(HEIGHT_TRANSITIONS, jnp.float32)

  idx = _select_layer(height_m[..., None] < heights[1:])

  p0 = _gather_layer(pt, idx)
  t0 = _gather_layer(tt, idx)
  l0 = _gather_layer(lapse, idx)
  h0 = heights[idx]

  temperature = t0 + l0 * (height_m - h0)
  is_iso = l0 == 0.0
  safe_l = jnp.where(is_iso, 1.0, l0)
  pressure_iso = p0 * jnp.exp(-_G * (height_m - h0) / (_R * temperature))
  pressure_lin = p0 * pmath.powf(temperature / t0, -_G / (_R * safe_l))
  pressure = jnp.where(is_iso, pressure_iso, pressure_lin)

  density = pressure / (_R * temperature)
  return pressure, temperature, density
