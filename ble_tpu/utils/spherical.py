"""Spherical-Earth geometry, vectorized.

Replaces the reference's s2sphere-based offset->latlng computation
(``utils/spherical_geometry.py:44-76``) with pure jnp great-circle math.
All angles are radians on device.
"""

import jax.numpy as jnp

from ble_tpu.ops import pmath

EARTH_RADIUS_M = 6371.0 * 1000.0  # Spherical approximation, as reference.


def relative_distance(x_m, y_m):
  """Euclidean distance of the (x, y) plane offset, meters."""
  return jnp.sqrt(x_m * x_m + y_m * y_m)


def latlng_from_offset(center_lat_rad, center_lng_rad, x_m, y_m):
  """Great-circle translation of a lat/lng by a local (x, y) offset.

  Args:
    center_lat_rad: latitude of the anchor point [rad].
    center_lng_rad: longitude of the anchor point [rad].
    x_m: eastward offset [m] (parallel to latitude circle).
    y_m: northward offset [m].

  Returns:
    (lat_rad, lng_rad) of the displaced point; lat clamped to +-pi/2,
    lng wrapped to (-pi, pi].
  """
  heading = pmath.atan2(x_m, y_m)  # 0 = North, increases East.
  angle = relative_distance(x_m, y_m) / EARTH_RADIUS_M

  cos_angle = jnp.cos(angle)
  sin_angle = jnp.sin(angle)
  sin_from_lat = jnp.sin(center_lat_rad)
  cos_from_lat = jnp.cos(center_lat_rad)

  sin_lat = cos_angle * sin_from_lat + sin_angle * cos_from_lat * jnp.cos(
      heading)
  d_lng = pmath.atan2(sin_angle * cos_from_lat * jnp.sin(heading),
                      cos_angle - sin_from_lat * sin_lat)

  new_lat = pmath.asin(jnp.clip(sin_lat, -1.0, 1.0))
  new_lat = jnp.clip(new_lat, -jnp.pi / 2.0, jnp.pi / 2.0)
  new_lng = center_lng_rad + d_lng
  # Normalize longitude to (-pi, pi].
  new_lng = new_lng - jnp.floor((new_lng + jnp.pi) / (2.0 * jnp.pi)) * (2.0 * jnp.pi)
  return new_lat, new_lng
