"""Reference-ordered episode reset: same seed -> same world (parity mode).

The fast path (`env.reset`) splits its key 7 ways up front -- the natural
shape for a vmapped reset. The REFERENCE instead consumes its PRNG through
a specific sequence of re-splits spread across BalloonEnv.reset,
BalloonArena.reset / _initialize_balloon and WindField.reset
(balloon_env.py:213, balloon_arena.py:170-177,242-258,
wind_field.py:113-123). `parity_reset` reproduces that exact split tree
with ble_tpu's own samplers, so that `env.seed(s); env.reset()` on the
reference and `parity_reset(s, ...)` here start from the SAME initial
conditions: atmosphere lapse blend, start time, balloon position/pressure/
upwelling-IR, OpenSimplex noise lattices, and VAE forecast grid.

Host-orchestrated (the OpenSimplex permutation builds are sequential
host work); parity runs are 1-env by design -- this is the fixed-seed
micro_eval verification surface, not the training path.
"""

import math

import jax
import jax.numpy as jnp

from ble_tpu.env import atmosphere as atmosphere_lib
from ble_tpu.env import env as env_lib
from ble_tpu.env import wind_field as wind_field_lib
from ble_tpu.utils import sampling

# BalloonArena initial-offset beta distribution (balloon_arena.py:153-154).
_ALPHA = 1.2
_BETA = 2.0


def parity_reset(seed: int, params: env_lib.EnvParams, field_fn=None,
                 field=None, field_dtype=jnp.float32, exact_noise=True):
  """Resets an episode with the reference's exact RNG consumption.

  Args:
    seed: the integer environment seed (reference env.seed(seed)).
    params: EnvParams.
    field_fn: forecast-key -> (21, 21, 10, 9, 2) grid (e.g. the VAE
      decode, which consumes the key exactly like the reference's
      GenerativeWindFieldSampler.sample_field: z = normal(key, (64,))).
    field: a pinned grid overriding field_fn (the forecast key is then
      drawn but unused, like the reference's _ConstSampler tests).
    field_dtype: forecast-grid storage dtype; f32 default so grid
      interpolation is not the parity bottleneck (training uses bf16).
    exact_noise: use bit-faithful OpenSimplex parity noise (default) vs
      the fast hash noise.

  Returns:
    (EnvState, observation), exactly as env.reset.
  """
  rng = jax.random.PRNGKey(seed)

  # BalloonEnv.reset (balloon_env.py:213).
  rng, arena_rng = jax.random.split(rng)

  # BalloonArena.reset (balloon_arena.py:170-172).
  arena_rng, atmosphere_key, time_key = jax.random.split(arena_rng, 3)
  atmosphere = atmosphere_lib.reset(atmosphere_key)
  t0 = sampling.sample_time(time_key)

  # BalloonArena._initialize_balloon (balloon_arena.py:242-258).
  arena_rng, *keys = jax.random.split(arena_rng, num=6)
  radius_m = jax.random.beta(keys[0], _ALPHA, _BETA) * 200_000.0
  theta = jax.random.uniform(keys[1], (), minval=0.0,
                             maxval=2.0 * math.pi)
  x_m = jnp.cos(theta) * radius_m
  y_m = jnp.sin(theta) * radius_m
  center_lat, center_lng = sampling.sample_location(keys[2])
  pressure = sampling.sample_pressure(keys[3], atmosphere)
  upwelling_ir = sampling.sample_upwelling_infrared(keys[4])

  # BalloonArena.reset -> WindField.reset (balloon_arena.py:176-177,
  # wind_field.py:121-123).
  arena_rng, wind_field_key = jax.random.split(arena_rng, 2)
  noise_key, forecast_key = jax.random.split(wind_field_key, num=2)

  if exact_noise:
    seeds, offsets, perms = wind_field_lib.reset_noise_exact(noise_key)
  else:
    seeds, offsets = wind_field_lib.reset_noise(noise_key)
    perms = None
  if field is None:
    field = field_fn(forecast_key)
  wind = wind_field_lib.WindFieldState(
      field=jnp.asarray(field).astype(field_dtype), noise_seeds=seeds,
      noise_offsets=offsets, noise_perms=perms)

  return env_lib.init_state(params, atmosphere, t0, x_m, y_m, center_lat,
                            center_lng, pressure, upwelling_ir, wind)
