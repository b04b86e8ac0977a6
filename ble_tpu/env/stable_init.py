"""Stable balloon initialization: closed-form mols_air + Newton temperature.

Functional counterpart of the reference ``env/balloon/stable_init.py``.
The 10-iteration Newton-Raphson search for the equilibrium internal
temperature (stable_init.py:94-120) is run as a fixed-length unrolled loop
with guarded updates (quadratic convergence makes the extra iterations
free), so it vmaps over balloons x pressure levels.
"""

import jax.numpy as jnp
from flax import struct

from ble_tpu.env import atmosphere as atmosphere_lib
from ble_tpu.env import balloon as balloon_lib
from ble_tpu.env import thermal
from ble_tpu.utils import constants


@struct.dataclass
class StableParams:
  ambient_temperature: jnp.ndarray
  internal_temperature: jnp.ndarray
  mols_air: jnp.ndarray
  envelope_volume: jnp.ndarray
  superpressure: jnp.ndarray


def calculate_stable_params_for_pressure(
    pressure, envelope_volume_base, envelope_volume_dv_pressure,
    envelope_mass, payload_mass, mols_lift_gas, solar_elevation_deg,
    solar_flux, upwelling_infrared,
    atmosphere: atmosphere_lib.AtmosphereParams,
    num_newton_iterations: int = 10) -> StableParams:
  """Equilibrium (T_amb, T_int, mols_air, volume, superpressure) at `pressure`.

  The solar elevation/flux are taken as inputs (the reference recomputes
  them per call at the same latlng/time; callers here hoist that).
  Reference: stable_init.py:40-129.
  """
  _, ambient_temperature, _ = atmosphere_lib.at_pressure(atmosphere, pressure)

  # Closed-form mols air from the buoyancy balance (stable_init.py:85-91).
  mols_air = (
      (pressure * constants.DRY_AIR_MOLAR_MASS * envelope_volume_base /
       (constants.UNIVERSAL_GAS_CONSTANT * ambient_temperature) -
       envelope_mass - payload_mass -
       constants.HE_MOLAR_MASS * mols_lift_gas) /
      constants.DRY_AIR_MOLAR_MASS)
  mols_air = jnp.maximum(mols_air, 0.0)

  # Newton-Raphson on dT/dt = 0 (stable_init.py:94-120).
  delta_temp = 0.01
  internal_temperature = jnp.full_like(jnp.asarray(pressure, jnp.float32),
                                       206.0)

  def dT(t):
    return thermal.d_balloon_temperature_dt(
        envelope_volume_base, envelope_mass, t, ambient_temperature, pressure,
        solar_elevation_deg, solar_flux, upwelling_infrared)

  for _ in range(num_newton_iterations):
    d1 = dT(internal_temperature - delta_temp / 2)
    d2 = dT(internal_temperature + delta_temp / 2)
    dd = (d2 - d1) / delta_temp
    mean_d = (d1 + d2) / 2.0
    update = jnp.where(jnp.abs(dd) > 0.0, mean_d / jnp.where(dd == 0, 1.0, dd),
                       0.0)
    internal_temperature = internal_temperature - update

  envelope_volume, superpressure = (
      balloon_lib.calculate_superpressure_and_volume(
          mols_lift_gas, mols_air, internal_temperature, pressure,
          envelope_volume_base, envelope_volume_dv_pressure))

  return StableParams(
      ambient_temperature=ambient_temperature,
      internal_temperature=internal_temperature,
      mols_air=mols_air,
      envelope_volume=envelope_volume,
      superpressure=superpressure)


def cold_start_to_stable_params(
    params: balloon_lib.BalloonParams,
    state: balloon_lib.BalloonState,
    atmosphere: atmosphere_lib.AtmosphereParams) -> balloon_lib.BalloonState:
  """Returns `state` with equilibrium thermo fields (stable_init.py:132-157)."""
  from ble_tpu.env import solar  # Local import to avoid cycle at module load.
  lat, lng = balloon_lib.latlng(state)
  el_deg, _, flux = solar.solar_calculator(lat, lng, state.time_s)
  stable = calculate_stable_params_for_pressure(
      state.pressure_pa, params.envelope_volume_base,
      params.envelope_volume_dv_pressure, params.envelope_mass,
      params.payload_mass, params.mols_lift_gas, el_deg, flux,
      state.upwelling_infrared_w_m2, atmosphere)
  return state.replace(
      ambient_temperature_k=stable.ambient_temperature,
      internal_temperature_k=stable.internal_temperature,
      mols_air=stable.mols_air,
      envelope_volume_m3=stable.envelope_volume,
      superpressure_pa=stable.superpressure)
