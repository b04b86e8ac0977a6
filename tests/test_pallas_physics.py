"""Fused Pallas physics kernel vs the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ble_tpu.env import atmosphere as atmosphere_lib
from ble_tpu.env import balloon as balloon_lib
from ble_tpu.env import env as env_lib
from ble_tpu.ops import pallas_physics


def _batched_setup(n=4):
  import functools
  params = env_lib.EnvParams()
  field_fn = env_lib.make_field_fn('static')
  reset_b = jax.vmap(functools.partial(env_lib.reset, params=params,
                                       field_fn=field_fn))
  states, obs = reset_b(jax.random.split(jax.random.PRNGKey(0), n))
  return params, states


@pytest.mark.slow
def test_fused_matches_xla_path():
  params, states = _batched_setup(4)
  balloon = states.balloon
  atmo = states.atmosphere
  wind_u = jnp.asarray([5.0, -3.0, 0.0, 10.0])
  wind_v = jnp.asarray([1.0, 2.0, -4.0, 0.0])
  actions = jnp.asarray([0, 1, 2, 0])

  # 3 substeps keep the interpreter tractable; the TPU equality test in
  # test_pallas_physics_tpu.py runs the full 18.
  xla_out = jax.vmap(
      lambda a, b, u, v, act: balloon_lib.simulate_step(
          params.balloon, a, b, u, v, act, time_delta_s=30,
          stride_s=10))(atmo, balloon, wind_u, wind_v, actions)
  fused_out = pallas_physics.simulate_step_fused(
      params.balloon, atmo, balloon, wind_u, wind_v, actions,
      time_delta_s=30, stride_s=10, interpret=True)

  # Mosaic and XLA fuse multiply-adds differently; the dp/dh computation
  # divides by a ~20 m height difference of ~15 km values, so sub-Pa
  # drift per step is inherent. Tolerances are physical, not bitwise.
  atol = {'pressure_pa': 2.0, 'superpressure_pa': 2.0,
          'battery_charge_j': 500.0, 'x_m': 2.0, 'y_m': 2.0,
          'envelope_volume_m3': 0.5, 'mols_air': 1.0}
  for name in balloon_lib.SUBSTEP_F32_FIELDS:
    a = np.asarray(getattr(xla_out, name))
    b = np.asarray(getattr(fused_out, name))
    np.testing.assert_allclose(b, a, rtol=5e-4, atol=atol.get(name, 1e-2),
                               err_msg=name)
  for name in balloon_lib.SUBSTEP_I32_FIELDS:
    np.testing.assert_array_equal(np.asarray(getattr(fused_out, name)),
                                  np.asarray(getattr(xla_out, name)),
                                  err_msg=name)
  # Safety/one-per-step fields updated identically.
  np.testing.assert_array_equal(np.asarray(fused_out.last_command),
                                np.asarray(xla_out.last_command))
  np.testing.assert_array_equal(
      np.asarray(fused_out.envelope_safety_state),
      np.asarray(xla_out.envelope_safety_state))


@pytest.mark.slow
def test_fused_frozen_after_terminal():
  params, states = _batched_setup(2)
  balloon = states.balloon.replace(
      status=jnp.asarray([balloon_lib.STATUS_BURST, balloon_lib.STATUS_OK]))
  out = pallas_physics.simulate_step_fused(
      params.balloon, states.atmosphere, balloon,
      jnp.asarray([5.0, 5.0]), jnp.asarray([0.0, 0.0]),
      jnp.asarray([1, 1]), interpret=True)
  assert float(out.x_m[0]) == float(balloon.x_m[0])  # Frozen.
  assert float(out.x_m[1]) != float(balloon.x_m[1])  # Advected.


@pytest.mark.slow
def test_layer_seam_state_stays_finite():
  """Regression: a balloon oscillating at the 17 km atmosphere layer seam.

  Captured from a real TPU training run: the old finite-difference
  dp/dh = 1 / (h(p+1) - h(p)) hit h(p+1) == h(p) EXACTLY under TPU
  transcendental accuracy (log rel err ~1e-5; exp flushes ~1e-6 args to
  1.0) and produced inf pressure -> NaN params. The analytic hydrostatic
  dp/dh = -g*p/(R*T) is singularity-free on every backend.
  """
  import json
  import os

  path = os.path.join(os.path.dirname(__file__), 'layer_seam_state.json')
  with open(path) as f:
    d = json.load(f)

  from ble_tpu.env import safety as safety_lib

  balloon = balloon_lib.BalloonState(
      **{k: jnp.asarray(v, jnp.float32 if isinstance(v, float) else jnp.int32)
         for k, v in d['balloon'].items()},
      power_safety=safety_lib.PowerSafetyState(
          navigation_is_paused=jnp.asarray(
              d['power_safety']['navigation_is_paused']),
          sunrise_with_hysteresis_s=jnp.asarray(
              d['power_safety']['sunrise_with_hysteresis_s'], jnp.int32),
          sunset_s=jnp.asarray(d['power_safety']['sunset_s'], jnp.int32)))
  atmo = atmosphere_lib.AtmosphereParams(
      **{k: jnp.asarray(v, jnp.float32) for k, v in d['atmosphere'].items()})
  params = balloon_lib.BalloonParams()

  # 10 agent steps (180 substeps) through the seam: XLA path.
  state = balloon
  for _ in range(10):
    state = balloon_lib.simulate_step(params, atmo, state, d['wind_u'],
                                      d['wind_v'], jnp.int32(0))
  for name in balloon_lib.SUBSTEP_F32_FIELDS:
    val = getattr(state, name)
    assert bool(jnp.isfinite(val)), (name, val)

  # Fused kernel (interpret on CPU), batched.
  e = 8
  batched = jax.tree.map(lambda x: jnp.broadcast_to(x, (e,) + x.shape),
                         balloon)
  atmo_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (e,) + x.shape), atmo)
  out = pallas_physics.simulate_step_fused(
      params, atmo_b, batched, jnp.full((e,), d['wind_u']),
      jnp.full((e,), d['wind_v']), jnp.zeros((e,), jnp.int32),
      interpret=jax.default_backend() != 'tpu')
  for name in balloon_lib.SUBSTEP_F32_FIELDS:
    val = getattr(out, name)
    assert bool(jnp.all(jnp.isfinite(val))), name
