"""(pressure_ratio, state_of_charge) -> ACS power lookup.

Vectorized counterpart of the reference bisect-based table
(``env/balloon/power_table.py:21-38``): both bisects become
`jnp.searchsorted` into padded constant arrays.
"""

import jax.numpy as jnp

_PR_INTERVALS = jnp.asarray([1.08, 1.11, 1.14, 1.17, 1.2, 1.23, 1.26],
                            jnp.float32)
_INF = jnp.inf
# One row per pressure-ratio interval; soc thresholds padded with +inf and
# values padded by repeating the last entry so the lookup is rectangular.
_SOC_THRESHOLDS = jnp.asarray([
    [0.3, 0.4, 0.5],
    [0.3, 0.4, 0.7],
    [0.3, 0.4, 0.6],
    [0.3, 0.4, 0.5],
    [0.3, 0.4, 0.5],
    [0.4, 0.5, _INF],
    [0.5, 0.6, _INF],
    [0.5, 0.6, _INF],
], jnp.float32)
_POWER_VALUES = jnp.asarray([
    [0.0, 150.0, 175.0, 200.0],
    [0.0, 200.0, 200.0, 225.0],
    [0.0, 225.0, 225.0, 250.0],
    [0.0, 200.0, 225.0, 250.0],
    [0.0, 225.0, 250.0, 275.0],
    [0.0, 275.0, 300.0, 300.0],
    [0.0, 300.0, 325.0, 325.0],
    [0.0, 325.0, 350.0, 350.0],
], jnp.float32)


def lookup(pressure_ratio, state_of_charge):
  """Power [W] the flight controller would budget for descending."""
  pressure_ratio = jnp.asarray(pressure_ratio, jnp.float32)
  state_of_charge = jnp.asarray(state_of_charge, jnp.float32)
  pr_id = jnp.searchsorted(_PR_INTERVALS, pressure_ratio, side='right')
  thresholds = _SOC_THRESHOLDS[pr_id]
  soc_id = jnp.sum(
      (state_of_charge[..., None] >= thresholds).astype(jnp.int32), axis=-1)
  return jnp.take_along_axis(_POWER_VALUES[pr_id], soc_id[..., None],
                             axis=-1)[..., 0]
