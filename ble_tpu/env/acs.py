"""Altitude Control System lookup tables as device-resident arrays.

The reference builds scipy `interp1d`/`interp2d` objects at import time
(``env/balloon/acs.py:24-41``); here the same tables are constants and the
lookups are branchless piecewise/bilinear math built only from primitives
that Pallas TPU lowers (no searchsorted, no dynamic gathers) -- this code
runs inside the fused physics kernel.
"""

import jax.numpy as jnp

from ble_tpu.utils import constants

# pressure_ratio -> optimal compressor power [W] (acs.py:24-28). The end
# segments have zero slope, so clamping == scipy's linear extrapolation.
# Non-uniform knots -> explicit piecewise-linear evaluation.
_PR_KNOTS = (1.0, 1.05, 1.2, 1.25, 1.35)
_POWER_KNOTS = (100.0, 100.0, 300.0, 400.0, 400.0)

# (pressure_ratio, power) -> fan efficiency (acs.py:31-41). Rows are the 4
# power levels (uniform 100..400), columns the 13 pressure ratios (uniform
# 1.05..1.35), matching scipy interp2d's (y, x) z-layout.
_EFF_TABLE = (
    (0.4, 0.4, 0.3, 0.2, 0.2, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    (0.4, 0.3, 0.3, 0.30, 0.25, 0.23, 0.20, 0.15, 0.12, 0.10, 0.0, 0.0, 0.0),
    (0.0, 0.3, 0.25, 0.25, 0.25, 0.20, 0.20, 0.20, 0.2, 0.15, 0.13, 0.12,
     0.11),
    (0.0, 0.23, 0.23, 0.23, 0.23, 0.23, 0.20, 0.20, 0.20, 0.18, 0.16, 0.15,
     0.13),
)


def get_most_efficient_power(pressure_ratio):
  """Optimal ACS power [W]: piecewise-linear over the knot table."""
  pr = jnp.clip(jnp.asarray(pressure_ratio, jnp.float32), _PR_KNOTS[0],
                _PR_KNOTS[-1])
  power = jnp.full_like(pr, _POWER_KNOTS[0])
  for i in range(len(_PR_KNOTS) - 1):
    x0, x1 = _PR_KNOTS[i], _PR_KNOTS[i + 1]
    y0, y1 = _POWER_KNOTS[i], _POWER_KNOTS[i + 1]
    seg = y0 + (pr - x0) * ((y1 - y0) / (x1 - x0))
    power = jnp.where(pr >= x0, seg, power)
  return jnp.minimum(power, _POWER_KNOTS[-1])


def get_fan_efficiency(pressure_ratio, power_w):
  """Bilinear efficiency with edge-cell extrapolation, via one-hot sums.

  Both axes are uniform, so cell indices are direct arithmetic; the table
  value gather is a sum of 52 masked constants (VPU-friendly; the table is
  tiny and the masks fuse).
  """
  pr = jnp.asarray(pressure_ratio, jnp.float32)
  pw = jnp.asarray(power_w, jnp.float32)

  # Column (pressure ratio) cell: uniform 1.05..1.35 step 0.025, 12 cells.
  cj = jnp.clip(jnp.floor((pr - 1.05) / 0.025), 0, 11)
  wj = (pr - (1.05 + cj * 0.025)) / 0.025
  # Row (power) cell: uniform 100..400 step 100, 3 cells.
  ci = jnp.clip(jnp.floor((pw - 100.0) / 100.0), 0, 2)
  wi = (pw - (100.0 + ci * 100.0)) / 100.0

  def table_at(di, dj):
    """T[ci+di, cj+dj] as a masked-constant sum."""
    out = jnp.zeros_like(pr)
    for r in range(4):
      row_mask = (ci + di) == r
      for c in range(13):
        val = _EFF_TABLE[r][c]
        if val == 0.0:
          continue
        out = out + jnp.where(
            jnp.logical_and(row_mask, (cj + dj) == c), val, 0.0)
    return out

  z00 = table_at(0, 0)
  z01 = table_at(0, 1)
  z10 = table_at(1, 0)
  z11 = table_at(1, 1)
  return ((1 - wi) * ((1 - wj) * z00 + wj * z01) +
          wi * ((1 - wj) * z10 + wj * z11))


def get_mass_flow(power_w, efficiency):
  """Compressor mass flow [kg/s] (acs.py:67-68)."""
  return efficiency * power_w / constants.NUM_SECONDS_PER_HOUR
