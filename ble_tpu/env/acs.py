"""Altitude Control System lookup tables as device-resident arrays.

The reference builds scipy `interp1d`/`interp2d` objects at import time
(``env/balloon/acs.py:24-41``); here the same tables are jnp constants and
the lookups are `jnp.interp` + bilinear gathers, vectorized over balloons.
"""

import jax.numpy as jnp

from ble_tpu.utils import constants

# pressure_ratio -> optimal compressor power [W] (acs.py:24-28). The end
# segments have zero slope, so clamping == scipy's linear extrapolation.
_PR_KNOTS = jnp.asarray([1.0, 1.05, 1.2, 1.25, 1.35], jnp.float32)
_POWER_KNOTS = jnp.asarray([100.0, 100.0, 300.0, 400.0, 400.0], jnp.float32)

# (pressure_ratio, power) -> fan efficiency (acs.py:31-41). Rows are the 4
# power levels, columns the 13 pressure ratios, matching scipy interp2d's
# (y, x) z-layout.
_EFF_PR = jnp.linspace(1.05, 1.35, 13)
_EFF_POWER = jnp.linspace(100.0, 400.0, 4)
_EFF_TABLE = jnp.asarray([
    [0.4, 0.4, 0.3, 0.2, 0.2, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    [0.4, 0.3, 0.3, 0.30, 0.25, 0.23, 0.20, 0.15, 0.12, 0.10, 0.0, 0.0, 0.0],
    [0.0, 0.3, 0.25, 0.25, 0.25, 0.20, 0.20, 0.20, 0.2, 0.15, 0.13, 0.12,
     0.11],
    [0.0, 0.23, 0.23, 0.23, 0.23, 0.23, 0.20, 0.20, 0.20, 0.18, 0.16, 0.15,
     0.13],
], jnp.float32)


def get_most_efficient_power(pressure_ratio):
  """Optimal ACS power [W] for the current backpressure ratio."""
  return jnp.interp(pressure_ratio, _PR_KNOTS, _POWER_KNOTS)


def _cell_and_weight(x, knots):
  """Lower cell index and fractional weight, extrapolating on edge cells."""
  idx = jnp.clip(jnp.searchsorted(knots, x, side='right') - 1, 0,
                 knots.shape[0] - 2)
  x0 = knots[idx]
  x1 = knots[idx + 1]
  w = (x - x0) / (x1 - x0)
  return idx, w


def get_fan_efficiency(pressure_ratio, power_w):
  """Bilinear efficiency lookup with edge-cell extrapolation."""
  i, wi = _cell_and_weight(power_w, _EFF_POWER)
  j, wj = _cell_and_weight(pressure_ratio, _EFF_PR)
  z00 = _EFF_TABLE[i, j]
  z01 = _EFF_TABLE[i, j + 1]
  z10 = _EFF_TABLE[i + 1, j]
  z11 = _EFF_TABLE[i + 1, j + 1]
  return ((1 - wi) * ((1 - wj) * z00 + wj * z01) +
          wi * ((1 - wj) * z10 + wj * z11))


def get_mass_flow(power_w, efficiency):
  """Compressor mass flow [kg/s] (acs.py:67-68)."""
  return efficiency * power_w / constants.NUM_SECONDS_PER_HOUR
