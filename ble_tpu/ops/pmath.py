"""Pallas-safe elementary functions.

Mosaic (Pallas TPU) does not lower `acos`/`asin`/`atan2`/`fmod`/fractional
`pow`; this module provides implementations built only from primitives it
does lower (sin, cos, exp, log, sqrt, trunc, select, arithmetic). The
SAME implementations are used on the XLA path (solar/spherical/thermal/
physics modules import from here), so the fused Pallas physics kernel and
the reference jnp path produce bit-identical trajectories.

atan accuracy: odd minimax polynomial on [-1, 1] + range reduction;
max error ~1e-6 rad, far below the solar model's own fidelity.
"""

import jax.numpy as jnp

PI = float(jnp.pi)


def _atan_poly(x):
  """atan on [-1, 1] (odd polynomial, single-precision minimax)."""
  t = x * x
  p = -0.0040540580
  p = p * t + 0.0218612288
  p = p * t - 0.0559098861
  p = p * t + 0.0964200441
  p = p * t - 0.1390853351
  p = p * t + 0.1994653599
  p = p * t - 0.3332985605
  p = p * t + 0.9999993329
  return x * p


def atan(x):
  x = jnp.asarray(x, jnp.float32)
  big = jnp.abs(x) > 1.0
  inv = 1.0 / jnp.where(x == 0, 1.0, x)
  outer = jnp.sign(x) * (PI / 2.0) - _atan_poly(inv)
  return jnp.where(big, outer, _atan_poly(x))


def atan2(y, x):
  """Four-quadrant arctangent matching jnp.arctan2 conventions."""
  y = jnp.asarray(y, jnp.float32)
  x = jnp.asarray(x, jnp.float32)
  safe_x = jnp.where(x == 0, 1.0, x)
  base = atan(y / safe_x)
  # Quadrant corrections.
  result = jnp.where(x > 0, base,
                     jnp.where(y >= 0, base + PI, base - PI))
  # x == 0 column: +-pi/2 (0 when y == 0 too, matching atan2(0, 0) = 0...
  # jnp gives 0.0 for (0, +0)).
  on_axis = jnp.where(y > 0, PI / 2.0,
                      jnp.where(y < 0, -PI / 2.0, 0.0))
  return jnp.where(x == 0, on_axis, result)


def asin(x):
  x = jnp.clip(jnp.asarray(x, jnp.float32), -1.0, 1.0)
  return atan2(x, jnp.sqrt(jnp.maximum((1.0 - x) * (1.0 + x), 0.0)))


def acos(x):
  return PI / 2.0 - asin(x)


def tan(x):
  return jnp.sin(x) / jnp.cos(x)


def fmod(a, b):
  """C-style fmod (sign of the dividend), like jnp.fmod."""
  a = jnp.asarray(a, jnp.float32)
  return a - jnp.trunc(a / b) * b


def powf(x, p):
  """x**p for positive x (p may be a scalar or array), via exp(p*log(x)).

  x <= 0 maps to 0 (all physics uses are non-negative quantities).
  """
  x = jnp.asarray(x, jnp.float32)
  safe = jnp.maximum(x, 1e-30)
  return jnp.where(x > 0, jnp.exp(p * jnp.log(safe)), 0.0)
