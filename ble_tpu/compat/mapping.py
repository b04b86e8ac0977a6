"""State converters between the reference environment and ble_tpu.

Used by the parity harness (tests/test_reference_parity.py,
tools/parity_report.py) to run the SAME pinned balloon through the actual
reference simulator (reference env/balloon/balloon.py:253-340) and through
ble_tpu's scanned physics (ble_tpu/env/balloon.py:344+) and compare.

Enum values align 1:1 across the two codebases by construction
(reference control.py:21-25 / balloon.py:66-71 vs ble_tpu safety.py:20,
balloon.py:30-33), as do the safety-layer state orderings.

All reference datetimes are naive-UTC (the reference samples times as UTC
unix hours, sampling.py:65-97); ble_tpu stores int32 unix seconds.
"""

import datetime as dt

import jax.numpy as jnp
import numpy as np

from ble_tpu.env import balloon as balloon_lib
from ble_tpu.env import safety
from ble_tpu.utils import constants

_UTC = dt.timezone.utc


def dt_to_unix_s(d: dt.datetime) -> int:
  if d.tzinfo is None:
    d = d.replace(tzinfo=_UTC)
  return int(d.timestamp())


def unix_s_to_dt(s: int) -> dt.datetime:
  # The reference requires tz-aware datetimes (solar.py:62-63).
  return dt.datetime.fromtimestamp(int(s), tz=_UTC)


# Reference safety-layer enum objects are keyed by .value; both safety
# modules in ble_tpu use the same integer ordering.


def ref_balloon_state_to_mine(ref_bs):
  """Converts a reference BalloonState into (BalloonParams, BalloonState).

  The reference state must be constructed (its __post_init__ builds the
  safety layers); private layer internals (_sunrise_with_hysteresis,
  _sunset) are read so the mapped power-safety state matches exactly.
  """
  f32 = jnp.float32
  params = balloon_lib.BalloonParams(
      envelope_volume_base=f32(ref_bs.envelope_volume_base),
      envelope_volume_dv_pressure=f32(ref_bs.envelope_volume_dv_pressure),
      envelope_mass=f32(ref_bs.envelope_mass),
      envelope_max_superpressure=f32(ref_bs.envelope_max_superpressure),
      envelope_cod=f32(ref_bs.envelope_cod),
      payload_mass=f32(ref_bs.payload_mass),
      nighttime_power_load_w=f32(ref_bs.nighttime_power_load.watts),
      daytime_power_load_w=f32(ref_bs.daytime_power_load.watts),
      acs_valve_hole_diameter_m=f32(ref_bs.acs_valve_hole_diameter.meters),
      battery_capacity_j=f32(ref_bs.battery_capacity.watt_hours *
                             constants.WATT_HOURS_TO_JOULES),
      mols_lift_gas=f32(ref_bs.mols_lift_gas),
      power_safety_layer_enabled=bool(ref_bs.power_safety_layer_enabled),
  )

  psl = ref_bs.power_safety_layer
  state = balloon_lib.BalloonState(
      center_lat_rad=f32(ref_bs.center_latlng.lat().radians),
      center_lng_rad=f32(ref_bs.center_latlng.lng().radians),
      x_m=f32(ref_bs.x.meters),
      y_m=f32(ref_bs.y.meters),
      pressure_pa=f32(ref_bs.pressure),
      time_s=jnp.int32(dt_to_unix_s(ref_bs.date_time)),
      time_elapsed_s=jnp.int32(ref_bs.time_elapsed.total_seconds()),
      ambient_temperature_k=f32(ref_bs.ambient_temperature),
      internal_temperature_k=f32(ref_bs.internal_temperature),
      mols_air=f32(ref_bs.mols_air),
      envelope_volume_m3=f32(ref_bs.envelope_volume),
      superpressure_pa=f32(ref_bs.superpressure),
      acs_power_w=f32(ref_bs.acs_power.watts),
      acs_mass_flow_kg_s=f32(ref_bs.acs_mass_flow),
      solar_charging_w=f32(ref_bs.solar_charging.watts),
      power_load_w=f32(ref_bs.power_load.watts),
      battery_charge_j=f32(ref_bs.battery_charge.watt_hours *
                           constants.WATT_HOURS_TO_JOULES),
      last_command=jnp.int32(int(ref_bs.last_command)),
      status=jnp.int32(ref_bs.status.value),
      upwelling_infrared_w_m2=f32(ref_bs.upwelling_infrared),
      power_safety=safety.PowerSafetyState(
          navigation_is_paused=jnp.bool_(psl.navigation_is_paused),
          sunrise_with_hysteresis_s=jnp.int32(
              dt_to_unix_s(psl._sunrise_with_hysteresis)),
          sunset_s=jnp.int32(dt_to_unix_s(psl._sunset))),
      envelope_safety_state=jnp.int32(
          ref_bs.envelope_safety_layer._state_machine.state.value),
      altitude_safety_state=jnp.int32(
          ref_bs.altitude_safety_layer._state_machine.state.value),
  )
  return params, state


def compare_fields(ref_bs, my_state) -> dict:
  """Absolute deltas of the physically meaningful fields, as floats."""
  j = constants.WATT_HOURS_TO_JOULES
  return {
      'x_m': abs(ref_bs.x.meters - float(my_state.x_m)),
      'y_m': abs(ref_bs.y.meters - float(my_state.y_m)),
      'pressure_pa': abs(ref_bs.pressure - float(my_state.pressure_pa)),
      'superpressure_pa': abs(ref_bs.superpressure -
                              float(my_state.superpressure_pa)),
      'mols_air': abs(ref_bs.mols_air - float(my_state.mols_air)),
      'internal_temperature_k': abs(ref_bs.internal_temperature -
                                    float(my_state.internal_temperature_k)),
      'ambient_temperature_k': abs(ref_bs.ambient_temperature -
                                   float(my_state.ambient_temperature_k)),
      'envelope_volume_m3': abs(ref_bs.envelope_volume -
                                float(my_state.envelope_volume_m3)),
      'battery_charge_j': abs(ref_bs.battery_charge.watt_hours * j -
                              float(my_state.battery_charge_j)),
      'acs_power_w': abs(ref_bs.acs_power.watts -
                         float(my_state.acs_power_w)),
      'solar_charging_w': abs(ref_bs.solar_charging.watts -
                              float(my_state.solar_charging_w)),
      'status': abs(ref_bs.status.value - int(my_state.status)),
  }
