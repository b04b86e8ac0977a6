"""Stratospheric superpressure balloon dynamics as a pure JAX function.

TPU-native re-design of the reference ``env/balloon/balloon.py``: the
stateful `Balloon` object with a Python substep loop
(``balloon.py:263-328``) becomes a `BalloonState` struct-of-arrays pytree
and `simulate_step(params, atmosphere, state, wind, action)` — a pure
function that applies the safety-layer action remapping once and then runs
the 18 10-second physics substeps under `lax.scan` with branchless
(jnp.where) dynamics. Terminal statuses freeze the state mid-scan, which
reproduces the reference's `break` semantics (balloon.py:327-328).

Everything vmaps over a leading batch axis to step thousands of balloons
in lockstep on one chip.
"""

import jax
import jax.numpy as jnp
from flax import struct

from ble_tpu.env import acs
from ble_tpu.env import atmosphere as atmosphere_lib
from ble_tpu.env import safety
from ble_tpu.env import solar
from ble_tpu.env import thermal
from ble_tpu.ops import pmath
from ble_tpu.utils import constants
from ble_tpu.utils import spherical

# Balloon status codes (reference balloon.py:66-70).
STATUS_OK = 0
STATUS_OUT_OF_POWER = 1
STATUS_BURST = 2
STATUS_ZEROPRESSURE = 3


@struct.dataclass
class BalloonParams:
  """Flight-vehicle constants (reference balloon.py:155-172).

  Kept as a (broadcastable) pytree so heterogeneous fleets are possible,
  but by default all balloons share the same scalars.
  """
  envelope_volume_base: jnp.ndarray = struct.field(
      default_factory=lambda: jnp.float32(1804.0))  # [m^3]
  envelope_volume_dv_pressure: jnp.ndarray = struct.field(
      default_factory=lambda: jnp.float32(0.0199))  # [m^3/Pa]
  envelope_mass: jnp.ndarray = struct.field(
      default_factory=lambda: jnp.float32(68.5))  # [kg]
  envelope_max_superpressure: jnp.ndarray = struct.field(
      default_factory=lambda: jnp.float32(2380.0))  # [Pa]
  envelope_cod: jnp.ndarray = struct.field(
      default_factory=lambda: jnp.float32(0.25))
  payload_mass: jnp.ndarray = struct.field(
      default_factory=lambda: jnp.float32(92.5))  # [kg]
  nighttime_power_load_w: jnp.ndarray = struct.field(
      default_factory=lambda: jnp.float32(183.7))
  daytime_power_load_w: jnp.ndarray = struct.field(
      default_factory=lambda: jnp.float32(120.4))
  acs_valve_hole_diameter_m: jnp.ndarray = struct.field(
      default_factory=lambda: jnp.float32(0.04))
  battery_capacity_j: jnp.ndarray = struct.field(
      default_factory=lambda: jnp.float32(
          3058.56 * constants.WATT_HOURS_TO_JOULES))
  mols_lift_gas: jnp.ndarray = struct.field(
      default_factory=lambda: jnp.float32(6830.0))
  power_safety_layer_enabled: bool = True


@struct.dataclass
class BalloonState:
  """Dynamic balloon state (reference balloon.py:74-208, flattened)."""
  # Position / time.
  center_lat_rad: jnp.ndarray
  center_lng_rad: jnp.ndarray
  x_m: jnp.ndarray
  y_m: jnp.ndarray
  pressure_pa: jnp.ndarray
  time_s: jnp.ndarray  # int32 unix seconds (absolute)
  time_elapsed_s: jnp.ndarray  # int32 seconds since episode start

  # Gas / thermal.
  ambient_temperature_k: jnp.ndarray
  internal_temperature_k: jnp.ndarray
  mols_air: jnp.ndarray
  envelope_volume_m3: jnp.ndarray
  superpressure_pa: jnp.ndarray

  # Power.
  acs_power_w: jnp.ndarray
  acs_mass_flow_kg_s: jnp.ndarray
  solar_charging_w: jnp.ndarray
  power_load_w: jnp.ndarray
  battery_charge_j: jnp.ndarray

  # Control / status.
  last_command: jnp.ndarray  # int32, safety.DOWN/STAY/UP
  status: jnp.ndarray  # int32 STATUS_*
  upwelling_infrared_w_m2: jnp.ndarray

  # Safety-layer states.
  power_safety: safety.PowerSafetyState
  envelope_safety_state: jnp.ndarray  # int32
  altitude_safety_state: jnp.ndarray  # int32


def latlng(state: BalloonState):
  """Current (lat_rad, lng_rad) of the balloon (balloon.py:217-220)."""
  return spherical.latlng_from_offset(state.center_lat_rad,
                                      state.center_lng_rad, state.x_m,
                                      state.y_m)


def battery_soc(params: BalloonParams, state: BalloonState):
  return state.battery_charge_j / params.battery_capacity_j


def pressure_ratio(state: BalloonState):
  """(pressure + max(superpressure, 0)) / pressure (balloon.py:247-250)."""
  sp = jnp.maximum(state.superpressure_pa, 0.0)
  return (state.pressure_pa + sp) / state.pressure_pa


def excess_energy(params: BalloonParams, state: BalloonState):
  """Whether solar power exceeds load with a full battery (balloon.py:231-238)."""
  lat, lng = latlng(state)
  el_deg, _, _ = solar.solar_calculator(lat, lng, state.time_s)
  power = solar.solar_power(el_deg, state.pressure_pa)
  return jnp.logical_and(power > params.daytime_power_load_w,
                         battery_soc(params, state) > 0.99)


def navigation_is_paused(state: BalloonState):
  """Any safety layer currently pausing navigation (balloon.py:240-245)."""
  return (state.power_safety.navigation_is_paused
          | safety.envelope_nav_is_paused(state.envelope_safety_state)
          | safety.altitude_nav_is_paused(state.altitude_safety_state))


def calculate_superpressure_and_volume(mols_lift_gas, mols_air,
                                       internal_temperature, pressure,
                                       envelope_volume_base,
                                       envelope_volume_dv_pressure):
  """(envelope_volume, superpressure), branchless (balloon.py:552-609)."""
  unconstrained_volume = (
      (mols_lift_gas + mols_air) * constants.UNIVERSAL_GAS_CONSTANT *
      internal_temperature / pressure)

  inflated = unconstrained_volume > envelope_volume_base
  b = -(envelope_volume_base - envelope_volume_dv_pressure * pressure)
  c = -(envelope_volume_dv_pressure * unconstrained_volume * pressure)
  vol_inflated = 0.5 * (-b + jnp.sqrt(b * b - 4 * c))
  sp_inflated = pressure * unconstrained_volume / vol_inflated - pressure

  envelope_volume = jnp.where(inflated, vol_inflated, unconstrained_volume)
  superpressure = jnp.where(inflated, sp_inflated, 0.0)
  return envelope_volume, superpressure


# Field names of the dynamic variables that the physics substep reads and
# writes, in the packing order used by the fused Pallas kernel
# (ops/pallas_physics.py).
SUBSTEP_F32_FIELDS = (
    'x_m', 'y_m', 'pressure_pa', 'ambient_temperature_k',
    'internal_temperature_k', 'mols_air', 'envelope_volume_m3',
    'superpressure_pa', 'acs_power_w', 'acs_mass_flow_kg_s',
    'solar_charging_w', 'power_load_w', 'battery_charge_j',
    'upwelling_infrared_w_m2', 'center_lat_rad', 'center_lng_rad')
SUBSTEP_I32_FIELDS = ('time_s', 'time_elapsed_s', 'status')


def substep_math(params: BalloonParams, at_pressure_fn, v: dict, wind_u,
                 wind_v, action, stride_s: float) -> dict:
  """One physics substep (reference _simulate_step_internal,
  balloon.py:356-549) on a plain dict of arrays.

  Shared verbatim between the XLA path (via `_substep`) and the fused
  Pallas kernel. All reads come from the incoming dict, matching the
  reference's apply-at-end state_changes semantics. `at_pressure_fn` maps
  pressure -> (height_m, temperature_k); `params` leaves may be jnp
  scalars (XLA) or Python floats (baked into the kernel).
  """
  dt = stride_s

  # Step 1: advection (balloon.py:394-395).
  new_x = v['x_m'] + wind_u * dt
  new_y = v['y_m'] + wind_v * dt

  # Step 2: buoyancy -> dh/dt -> dp/dt (balloon.py:412-445).
  rho_air = (v['pressure_pa'] * constants.DRY_AIR_MOLAR_MASS) / (
      constants.UNIVERSAL_GAS_CONSTANT * v['ambient_temperature_k'])
  drag = params.envelope_cod * pmath.powf(v['envelope_volume_m3'], 2.0 / 3.0)
  total_flight_system_mass = (
      constants.HE_MOLAR_MASS * params.mols_lift_gas +
      constants.DRY_AIR_MOLAR_MASS * v['mols_air'] + params.envelope_mass +
      params.payload_mass)
  buoyant = rho_air * v['envelope_volume_m3'] >= total_flight_system_mass
  direction = jnp.where(buoyant, 1.0, -1.0)
  dh_dt = direction * jnp.sqrt(
      jnp.abs(2 * (rho_air * v['envelope_volume_m3'] -
                   total_flight_system_mass) * constants.GRAVITY /
              (rho_air * drag)))
  _, new_ambient_temp = at_pressure_fn(v['pressure_pa'])
  # dp/dh analytically from hydrostatic balance (the atmosphere profile is
  # constructed from exactly this relation). The reference finite-differences
  # at_pressure over +-1 Pa (balloon.py:425-445) -- benign in float64, but
  # TPU transcendentals (log rel err ~1e-5; exp flushes ~1e-6 args to 1.0)
  # give the height-from-pressure formula ~0.5 m absolute error near layer
  # seams, where the 1 Pa height difference is ~0.6 m: h(p+1) - h(p) can
  # evaluate to EXACTLY ZERO and the division to inf (observed in training
  # at p ~= 8870 Pa, the 17 km seam). The closed form is singularity-free
  # and saves two of the three at_pressure evaluations per substep.
  dp_dh = -(constants.GRAVITY * v['pressure_pa'] /
            (constants.DRY_AIR_SPECIFIC_GAS_CONSTANT * new_ambient_temp))
  dp_dt = dp_dh * dh_dt
  new_pressure = v['pressure_pa'] + dp_dt * dt

  # Step 3: ambient + internal temperature (balloon.py:447-467).
  lat, lng = spherical.latlng_from_offset(v['center_lat_rad'],
                                          v['center_lng_rad'], v['x_m'],
                                          v['y_m'])
  solar_elevation, _, solar_flux = solar.solar_calculator(lat, lng,
                                                          v['time_s'])
  d_internal_temp = thermal.d_balloon_temperature_dt(
      v['envelope_volume_m3'], params.envelope_mass,
      v['internal_temperature_k'], v['ambient_temperature_k'],
      v['pressure_pa'], solar_elevation, solar_flux,
      v['upwelling_infrared_w_m2'])
  new_internal_temp = v['internal_temperature_k'] + d_internal_temp * dt

  # Step 4: superpressure & volume (balloon.py:469-482).
  new_volume, new_superpressure = calculate_superpressure_and_volume(
      params.mols_lift_gas, v['mols_air'], v['internal_temperature_k'],
      v['pressure_pa'], params.envelope_volume_base,
      params.envelope_volume_dv_pressure)

  # Step 5: ACS (balloon.py:484-519).
  sp_pos = jnp.maximum(v['superpressure_pa'], 0.0)
  pr = (v['pressure_pa'] + sp_pos) / v['pressure_pa']
  # UP: vent air through the valve.
  valve_area = jnp.pi * params.acs_valve_hole_diameter_m ** 2 / 4.0
  default_valve_hole_cd = 0.62
  gas_density = (v['superpressure_pa'] + v['pressure_pa']) * (
      constants.DRY_AIR_MOLAR_MASS /
      (constants.UNIVERSAL_GAS_CONSTANT * v['internal_temperature_k']))
  up_mass_flow = -default_valve_hole_cd * valve_area * jnp.sqrt(
      2.0 * sp_pos * gas_density)
  # DOWN: run the compressor at the most efficient power.
  down_power = acs.get_most_efficient_power(pr)
  down_eff = acs.get_fan_efficiency(pr, down_power)
  down_mass_flow = acs.get_mass_flow(down_power, down_eff)

  new_acs_power = jnp.where(action == safety.DOWN, down_power, 0.0)
  new_acs_mass_flow = jnp.where(
      action == safety.UP, up_mass_flow,
      jnp.where(action == safety.DOWN, down_mass_flow, 0.0))

  new_mols_air = jnp.maximum(
      v['mols_air'] +
      (new_acs_mass_flow / constants.DRY_AIR_MOLAR_MASS) * dt, 0.0)

  # Step 6: power & battery (balloon.py:521-542).
  is_day = solar_elevation > solar.MIN_SOLAR_EL_DEG
  new_solar_charging = jnp.where(
      is_day, solar.solar_power(solar_elevation, v['pressure_pa']), 0.0)
  new_power_load = jnp.where(is_day, params.daytime_power_load_w,
                             params.nighttime_power_load_w) + new_acs_power
  new_battery = jnp.clip(
      v['battery_charge_j'] + (new_solar_charging - new_power_load) * dt,
      0.0, params.battery_capacity_j)

  # Terminal statuses; assignment order in the reference dict makes
  # OUT_OF_POWER override BURST/ZEROPRESSURE in the same substep.
  new_status = jnp.full_like(v['status'], STATUS_OK)
  new_status = jnp.where(new_superpressure > params.envelope_max_superpressure,
                         STATUS_BURST, new_status)
  new_status = jnp.where(new_superpressure <= 0.0, STATUS_ZEROPRESSURE,
                         new_status)
  new_status = jnp.where(new_battery <= 0.0, STATUS_OUT_OF_POWER, new_status)

  stride_i = jnp.int32(stride_s)
  return {
      'x_m': new_x,
      'y_m': new_y,
      'pressure_pa': new_pressure,
      'ambient_temperature_k': new_ambient_temp,
      'internal_temperature_k': new_internal_temp,
      'mols_air': new_mols_air,
      'envelope_volume_m3': new_volume,
      'superpressure_pa': new_superpressure,
      'acs_power_w': new_acs_power,
      'acs_mass_flow_kg_s': new_acs_mass_flow,
      'solar_charging_w': new_solar_charging,
      'power_load_w': new_power_load,
      'battery_charge_j': new_battery,
      'upwelling_infrared_w_m2': v['upwelling_infrared_w_m2'],
      'center_lat_rad': v['center_lat_rad'],
      'center_lng_rad': v['center_lng_rad'],
      'time_s': v['time_s'] + stride_i,
      'time_elapsed_s': v['time_elapsed_s'] + stride_i,
      'status': new_status,
  }


def _substep(params: BalloonParams,
             atmosphere: atmosphere_lib.AtmosphereParams,
             state: BalloonState, wind_u, wind_v, action,
             stride_s: float) -> BalloonState:
  """Pytree wrapper around `substep_math` (XLA path)."""
  def at_pressure_fn(pressure):
    height, temperature, _ = atmosphere_lib.at_pressure(atmosphere, pressure)
    return height, temperature

  v = {name: getattr(state, name)
       for name in SUBSTEP_F32_FIELDS + SUBSTEP_I32_FIELDS}
  out = substep_math(params, at_pressure_fn, v, wind_u, wind_v, action,
                     jnp.float32(stride_s))
  return state.replace(**{k: out[k] for k in out
                          if k not in ('center_lat_rad', 'center_lng_rad',
                                       'upwelling_infrared_w_m2')})


def effective_action(params: BalloonParams,
                     atmosphere: atmosphere_lib.AtmosphereParams,
                     state: BalloonState, action):
  """Applies the three safety layers in reference order
  (power -> envelope -> altitude; balloon.py:304-313).

  Returns (new power/envelope/altitude safety states, effective action).
  """
  power_state = state.power_safety
  act = action
  if params.power_safety_layer_enabled:
    power_state, act = safety.power_safety(
        power_state, act, state.time_s, params.nighttime_power_load_w,
        state.battery_charge_j, params.battery_capacity_j)
  envelope_state, act = safety.envelope_safety(
      state.envelope_safety_state, act, state.superpressure_pa,
      params.envelope_max_superpressure)
  altitude_state, act = safety.altitude_safety(
      state.altitude_safety_state, act, atmosphere, state.pressure_pa)
  return power_state, envelope_state, altitude_state, act


def simulate_step(params: BalloonParams,
                  atmosphere: atmosphere_lib.AtmosphereParams,
                  state: BalloonState, wind_u, wind_v, action,
                  time_delta_s: int = constants.AGENT_TIME_STEP_SECONDS,
                  stride_s: int = constants.PHYSICS_STRIDE_SECONDS
                  ) -> BalloonState:
  """Advances the balloon by one agent step (balloon.py:263-328).

  Unlike the reference (which asserts), stepping a balloon whose status is
  already terminal is a no-op: its state stays frozen, which is what
  batched auto-resetting environments need.
  """
  assert time_delta_s % stride_s == 0
  num_substeps = time_delta_s // stride_s

  power_state, envelope_state, altitude_state, act = effective_action(
      params, atmosphere, state, action)
  was_ok = state.status == STATUS_OK
  state = state.replace(
      last_command=jnp.where(was_ok, action, state.last_command),
      power_safety=jax.tree.map(
          lambda new, old: jnp.where(was_ok, new, old), power_state,
          state.power_safety),
      envelope_safety_state=jnp.where(was_ok, envelope_state,
                                      state.envelope_safety_state),
      altitude_safety_state=jnp.where(was_ok, altitude_state,
                                      state.altitude_safety_state))

  def body(carry, _):
    s = carry
    active = s.status == STATUS_OK
    nxt = _substep(params, atmosphere, s, wind_u, wind_v, act, stride_s)
    merged = jax.tree.map(
        lambda new, old: jnp.where(active, new, old), nxt, s)
    return merged, None

  state, _ = jax.lax.scan(body, state, None, length=num_substeps)
  return state
