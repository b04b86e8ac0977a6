"""Fused Pallas TPU kernel for the balloon physics substep loop.

The 18x10s physics substeps dominate the environment step (~6.4 ms of a
~7.2 ms step at 4096 envs): under XLA each substep's ~200 small (E,)
elementwise kernels are dispatch/latency-bound. This kernel runs the
WHOLE substep loop in VMEM: each grid program loads a (8, 128)-env tile
of the ~45 packed state/atmosphere/wind lanes once, iterates all substeps
in registers (solar model, thermal ODE, buoyancy, superpressure solve,
ACS tables, battery -- the exact `balloon.substep_math` shared with the
XLA path), and writes the tile back once. One HBM round-trip instead of
~3600 kernel launches.

Numerics are identical to the XLA path by construction: the same
`substep_math` runs in both, built exclusively from Mosaic-lowerable
primitives (see ops/pmath.py).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ble_tpu.env import atmosphere as atmosphere_lib
from ble_tpu.env import balloon as balloon_lib

ROWS = 8
LANES = 128
BLOCK_ENVS = ROWS * LANES

_F32 = balloon_lib.SUBSTEP_F32_FIELDS
_I32 = balloon_lib.SUBSTEP_I32_FIELDS
_NF = len(_F32)
_NI = len(_I32)
_NUM_LAYERS = 7

_HEIGHTS = atmosphere_lib.HEIGHT_TRANSITIONS


def _at_pressure_layers_leading(lapse, temps, pres, pressure):
  """(height_m, temperature_k) at `pressure`; per-layer arrays are lists
  with the layer axis unrolled (kernel-friendly: no gathers/argmax).

  Same math as atmosphere.at_pressure (reference
  standard_atmosphere.py:122-154), selected with one-hot sums over the 7
  layers.
  """
  from ble_tpu.ops import pmath
  from ble_tpu.utils import constants

  r = constants.DRY_AIR_SPECIFIC_GAS_CONSTANT
  g = constants.GRAVITY

  # Monotone mask: pressure > pres[i+1] flips once along i.
  mask_sum = jnp.zeros_like(pressure, dtype=jnp.int32)
  for i in range(_NUM_LAYERS):
    mask_sum = mask_sum + (pressure > pres[i + 1]).astype(jnp.int32)
  idx = _NUM_LAYERS - mask_sum

  p0 = jnp.zeros_like(pressure)
  t0 = jnp.zeros_like(pressure)
  l0 = jnp.zeros_like(pressure)
  h0 = jnp.zeros_like(pressure)
  for i in range(_NUM_LAYERS):
    sel = idx == i
    p0 = jnp.where(sel, pres[i], p0)
    t0 = jnp.where(sel, temps[i], t0)
    l0 = jnp.where(sel, lapse[i], l0)
    h0 = jnp.where(sel, jnp.float32(_HEIGHTS[i]), h0)

  is_iso = l0 == 0.0
  safe_l = jnp.where(is_iso, 1.0, l0)
  height_iso = (-r * t0 / g) * jnp.log(pressure / p0) + h0
  height_lin = (pmath.powf(pressure / p0, -r * safe_l / g) - 1.0) * (
      t0 / safe_l) + h0
  height = jnp.where(is_iso, height_iso, height_lin)
  temperature = t0 + l0 * (height - h0)
  return height, temperature


def _kernel(f32_ref, i32_ref, atmo_ref, wind_ref, action_ref,
            f32_out, i32_out, *, params, num_substeps, stride_s):
  v = {name: f32_ref[i] for i, name in enumerate(_F32)}
  v.update({name: i32_ref[i] for i, name in enumerate(_I32)})

  lapse = [atmo_ref[i] for i in range(_NUM_LAYERS)]
  temps = [atmo_ref[_NUM_LAYERS + i] for i in range(_NUM_LAYERS + 1)]
  pres = [atmo_ref[2 * _NUM_LAYERS + 1 + i] for i in range(_NUM_LAYERS + 1)]
  wind_u = wind_ref[0]
  wind_v = wind_ref[1]
  action = action_ref[0]

  at_pressure_fn = functools.partial(_at_pressure_layers_leading, lapse,
                                     temps, pres)

  order = list(v)

  def body(_, carry):
    v = dict(zip(order, carry))
    active = v['status'] == balloon_lib.STATUS_OK
    nv = balloon_lib.substep_math(params, at_pressure_fn, v, wind_u, wind_v,
                                  action, jnp.float32(stride_s))
    return tuple(jnp.where(active, nv[k], v[k]) for k in order)

  carry = jax.lax.fori_loop(0, num_substeps, body,
                            tuple(v[k] for k in order))
  v = dict(zip(order, carry))

  for i, name in enumerate(_F32):
    f32_out[i] = v[name]
  for i, name in enumerate(_I32):
    i32_out[i] = v[name]


def _concrete_params(params: balloon_lib.BalloonParams
                     ) -> balloon_lib.BalloonParams:
  """Bakes (fleet-uniform) balloon constants into the kernel as floats."""
  def conv(x):
    if isinstance(x, (bool, int, float)):
      return x
    arr = jnp.asarray(x)
    if arr.ndim != 0:
      raise ValueError(
          'The fused physics kernel requires fleet-uniform BalloonParams '
          f'(got shape {arr.shape}); use the XLA backend instead.')
    return float(arr)
  return jax.tree.map(conv, params)


def simulate_substeps_fused(params: balloon_lib.BalloonParams,
                            atmosphere: atmosphere_lib.AtmosphereParams,
                            state: balloon_lib.BalloonState,
                            wind_u, wind_v, effective_action,
                            num_substeps: int, stride_s: int,
                            interpret: bool = False
                            ) -> balloon_lib.BalloonState:
  """Runs `num_substeps` physics substeps for a BATCHED balloon state.

  Args:
    params: fleet-uniform BalloonParams (concrete scalars).
    atmosphere: batched AtmosphereParams (leaves (E, L)).
    state: batched BalloonState (leaves (E,)).
    wind_u, wind_v: (E,) advection wind (constant across substeps, as the
      reference: one lookup per agent step).
    effective_action: (E,) int32 action AFTER safety remapping.
    num_substeps, stride_s: loop config (reference: 18 x 10 s).
    interpret: run in the Pallas interpreter (for CPU tests).

  Returns:
    Updated BalloonState (same batch layout). Terminal balloons stay
    frozen, matching balloon.simulate_step.
  """
  params = _concrete_params(params)
  e = state.x_m.shape[0]
  e_pad = -(-e // BLOCK_ENVS) * BLOCK_ENVS

  def pack(arrays, dtype):
    stacked = jnp.stack([jnp.asarray(a, dtype) for a in arrays])
    padded = jnp.pad(stacked, ((0, 0), (0, e_pad - e)), mode='edge')
    return padded.reshape(stacked.shape[0], e_pad // LANES, LANES)

  f32 = pack([getattr(state, n) for n in _F32], jnp.float32)
  i32 = pack([getattr(state, n) for n in _I32], jnp.int32)
  atmo = pack(
      [atmosphere.lapse_rates[..., i] for i in range(_NUM_LAYERS)] +
      [atmosphere.temperature_transitions[..., i]
       for i in range(_NUM_LAYERS + 1)] +
      [atmosphere.pressure_transitions[..., i]
       for i in range(_NUM_LAYERS + 1)], jnp.float32)
  wind = pack([wind_u, wind_v], jnp.float32)
  action = pack([effective_action], jnp.int32)

  grid = e_pad // BLOCK_ENVS

  def spec(channels):
    return pl.BlockSpec((channels, ROWS, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)

  kernel = functools.partial(_kernel, params=params,
                             num_substeps=num_substeps, stride_s=stride_s)
  na = 2 * (_NUM_LAYERS + 1) + _NUM_LAYERS
  f32_new, i32_new = pl.pallas_call(
      kernel,
      grid=(grid,),
      in_specs=[spec(_NF), spec(_NI), spec(na), spec(2), spec(1)],
      out_specs=(spec(_NF), spec(_NI)),
      out_shape=(jax.ShapeDtypeStruct(f32.shape, jnp.float32),
                 jax.ShapeDtypeStruct(i32.shape, jnp.int32)),
      interpret=interpret,
  )(f32, i32, atmo, wind, action)

  f32_new = f32_new.reshape(_NF, e_pad)[:, :e]
  i32_new = i32_new.reshape(_NI, e_pad)[:, :e]
  updates = {name: f32_new[i] for i, name in enumerate(_F32)
             if name not in ('center_lat_rad', 'center_lng_rad',
                             'upwelling_infrared_w_m2')}
  updates.update({name: i32_new[i] for i, name in enumerate(_I32)})
  return state.replace(**updates)


def simulate_step_fused(params: balloon_lib.BalloonParams,
                        atmosphere: atmosphere_lib.AtmosphereParams,
                        state: balloon_lib.BalloonState,
                        wind_u, wind_v, action,
                        time_delta_s: int = None,
                        stride_s: int = None,
                        interpret: bool = False) -> balloon_lib.BalloonState:
  """Batched equivalent of balloon.simulate_step with the fused kernel.

  The once-per-step safety-layer remapping runs in XLA (it is already
  batched elementwise code); only the substep loop enters the kernel.
  """
  from ble_tpu.utils import constants
  time_delta_s = time_delta_s or constants.AGENT_TIME_STEP_SECONDS
  stride_s = stride_s or constants.PHYSICS_STRIDE_SECONDS
  assert time_delta_s % stride_s == 0

  power_state, envelope_state, altitude_state, act = (
      balloon_lib.effective_action(params, atmosphere, state, action))
  was_ok = state.status == balloon_lib.STATUS_OK
  action = jnp.asarray(action, jnp.int32)
  state = state.replace(
      last_command=jnp.where(was_ok, action, state.last_command),
      power_safety=jax.tree.map(
          lambda new, old: jnp.where(was_ok, new, old), power_state,
          state.power_safety),
      envelope_safety_state=jnp.where(was_ok, envelope_state,
                                      state.envelope_safety_state),
      altitude_safety_state=jnp.where(was_ok, altitude_state,
                                      state.altitude_safety_state))
  return simulate_substeps_fused(params, atmosphere, state, wind_u, wind_v,
                                 act, time_delta_s // stride_s, stride_s,
                                 interpret=interpret)
