"""Wind utilities (reference utils/wind.py:24-71).

`is_station_keeping_winds` decides whether a wind column permits station
keeping: the reference tests whether the origin lies inside the convex
hull of the (u, v) wind vectors via scipy.spatial.ConvexHull. That is
equivalent to the largest angular gap between wind directions being less
than pi (with nonzero winds), which vectorizes directly in jnp.
"""

import jax.numpy as jnp


def is_station_keeping_winds(u, v, magnitude_threshold: float = 1e-6):
  """True if winds at some altitudes can cancel winds at others.

  Args:
    u, v: (..., N) wind components across a column of altitudes.

  Returns:
    (...) bool: origin inside the convex hull of the wind vectors.
  """
  angles = jnp.arctan2(v, u)  # (..., N) in (-pi, pi].
  magnitude_ok = jnp.sqrt(u * u + v * v) > magnitude_threshold
  # Push negligible winds to a duplicate angle so they don't close gaps.
  angles = jnp.where(magnitude_ok, angles, jnp.nan)
  sorted_angles = jnp.sort(angles, axis=-1)  # NaNs go last.
  n_valid = jnp.sum(magnitude_ok, axis=-1)

  wrapped = jnp.where(jnp.isnan(sorted_angles),
                      sorted_angles[..., :1], sorted_angles)
  gaps = jnp.diff(wrapped, axis=-1)
  gaps = jnp.where(jnp.isnan(gaps) | (gaps < 0), 0.0, gaps)
  first = jnp.where(jnp.isnan(sorted_angles[..., 0]), 0.0,
                    sorted_angles[..., 0])
  # Gap that wraps around from the largest valid angle back to the first.
  max_valid = jnp.nanmax(jnp.where(jnp.isnan(sorted_angles), -jnp.inf,
                                   sorted_angles), axis=-1)
  wrap_gap = 2 * jnp.pi - (max_valid - first)
  max_gap = jnp.maximum(jnp.max(gaps, axis=-1), wrap_gap)
  return jnp.logical_and(n_valid >= 3, max_gap < jnp.pi)


def mean_wind_speed(field):
  """Mean wind speed over a (..., 21, 21, 10, 9, 2) grid
  (reference utils/wind.py:44-71)."""
  return jnp.mean(jnp.sqrt(jnp.sum(field ** 2, axis=-1)),
                  axis=(-1, -2, -3, -4))
