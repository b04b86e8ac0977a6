"""Initial-condition samplers, pure jax (reference utils/sampling.py).

The reference mixes jax RNG with tfp distributions and `.item()`
scalarizations; here everything is traced jnp so reset() can be jitted and
vmapped over thousands of envs.
"""

import datetime as dt
import math

import jax
import jax.numpy as jnp

from ble_tpu.env import atmosphere as atmosphere_lib
from ble_tpu.env import safety
from ble_tpu.utils import time_lib

MIN_ALLOWABLE_UPWELLING_IR = 225.0

_TIME_BEGIN_S = time_lib.unix_seconds_from_datetime(
    dt.datetime(2011, 1, 1, tzinfo=dt.timezone.utc))
_TIME_END_S = time_lib.unix_seconds_from_datetime(
    dt.datetime(2014, 12, 31, tzinfo=dt.timezone.utc))


def sample_location(key: jax.Array):
  """(lat_rad, lng_rad): lat in +-10 deg, lng in +-175 deg
  (sampling.py:37-62)."""
  lat_key, lng_key = jax.random.split(key)
  lat_deg = jax.random.uniform(lat_key, (), minval=-10.0, maxval=10.0)
  lng_deg = jax.random.uniform(lng_key, (), minval=-175.0, maxval=175.0)
  return jnp.radians(lat_deg), jnp.radians(lng_deg)


def sample_time(key: jax.Array):
  """Uniform int32 unix seconds in [2011-01-01, 2014-12-31)
  (sampling.py:65-83).

  Drawn via `jax.random.choice` with the DEFAULT int dtype, exactly like
  the reference, so the bit stream consumed matches under both the
  normal (int32) and the jax_enable_x64 f64-parity-lane (int64) modes; a
  dtype-pinned `randint` draws a different value under x64 and silently
  de-pairs every seed's world in the f64 lane.
  """
  offset = jax.random.choice(key, _TIME_END_S - _TIME_BEGIN_S, ())
  # Python-int addend adopts offset's dtype (int32 normally, int64 under
  # x64); the final absolute time always fits int32.
  return (_TIME_BEGIN_S + offset).astype(jnp.int32)


def sample_pressure(key: jax.Array,
                    atmosphere: atmosphere_lib.AtmosphereParams = None):
  """Uniform pressure in [6500, p(50kft)] (sampling.py:86-111)."""
  min_pressure = 6500.0
  if atmosphere is not None:
    max_pressure, _, _ = atmosphere_lib.at_height(atmosphere,
                                                  safety.ALTITUDE_MIN_M)
  else:
    max_pressure = 11400.0
  return jax.random.uniform(key, (), minval=min_pressure,
                            maxval=max_pressure)


def sample_upwelling_infrared(key: jax.Array, num_tries: int = 16):
  """LogitNormal(2, 315)-scaled upwelling IR with rejection >= 225 W/m^2.

  The reference rejection-samples in a Python loop (sampling.py:114-152);
  here we draw `num_tries` candidates and take the first acceptable one
  (P(all rejected) ~ 0.5^16), falling back to the minimum allowed.
  """
  z = jax.random.normal(key, (num_tries,)) * 315.0 + 2.0
  candidates = 315.0 * jax.nn.sigmoid(z)
  ok = candidates >= MIN_ALLOWABLE_UPWELLING_IR
  first = jnp.argmax(ok)
  return jnp.where(jnp.any(ok), candidates[first],
                   jnp.float32(MIN_ALLOWABLE_UPWELLING_IR))


def sample_initial_offset(key: jax.Array):
  """(x_m, y_m): beta(1.2, 2)-distributed radius within 200 km, uniform
  angle (reference balloon_arena.py:242-250)."""
  radius_key, theta_key = jax.random.split(key)
  radius_m = jax.random.beta(radius_key, 1.2, 2.0) * 200_000.0
  theta = jax.random.uniform(theta_key, (), minval=0.0,
                             maxval=2.0 * math.pi)
  return jnp.cos(theta) * radius_m, jnp.sin(theta) * radius_m
