"""Safety layers as branchless state lattices.

The reference implements three stateful safety layers with the
`transitions` state-machine library and datetime arithmetic
(``env/balloon/power_safety.py``, ``envelope_safety.py``,
``altitude_safety.py``). Here each one is a small integer state plus a pure
`get_action`-style function: region classification via threshold
comparisons, state transition via constant int8 tables, and action
remapping via `jnp.where`. Transition tables encode the reference's
first-match `transitions` semantics exactly.
"""

import jax.numpy as jnp
from flax import struct

from ble_tpu.env import atmosphere as atmosphere_lib
from ble_tpu.utils import constants

# Actions (reference env/balloon/control.py:21-25).
DOWN, STAY, UP = 0, 1, 2

# --- Envelope safety (envelope_safety.py:40-157) ---
ENVELOPE_CRITICAL_BUFFER = 150.0  # [Pa]
ENVELOPE_BUFFER = 250.0  # [Pa]
ENVELOPE_RESTART_HYSTERESIS = 50.0  # [Pa]

# States: 0 NOMINAL, 1 LOW_CRITICAL, 2 LOW, 3 HIGH, 4 HIGH_CRITICAL.
# Rows: superpressure region (low_critical, low, low_nominal, nominal,
# high_nominal, high, high_critical); columns: previous state.
_ENVELOPE_TABLE = jnp.asarray([
    [1, 1, 1, 1, 1],  # low_critical -> LOW_CRITICAL from anywhere
    [2, 2, 2, 2, 2],  # low -> LOW
    [0, 2, 2, 0, 0],  # low_nominal: stays LOW if was LOW/LOW_CRITICAL
    [0, 0, 0, 0, 0],  # nominal -> NOMINAL
    [0, 0, 0, 3, 3],  # high_nominal: stays HIGH if was HIGH/HIGH_CRITICAL
    [3, 3, 3, 3, 3],  # high -> HIGH
    [4, 4, 4, 4, 4],  # high_critical -> HIGH_CRITICAL
], jnp.int32)


def envelope_safety(envelope_state, action, superpressure,
                    max_superpressure):
  """Returns (new_state, effective_action)."""
  shape = jnp.shape(superpressure)
  thresholds = jnp.stack([
      jnp.broadcast_to(jnp.asarray(t, jnp.float32), shape) for t in (
          ENVELOPE_CRITICAL_BUFFER,
          ENVELOPE_BUFFER,
          ENVELOPE_BUFFER + ENVELOPE_RESTART_HYSTERESIS,
          max_superpressure - ENVELOPE_BUFFER - ENVELOPE_RESTART_HYSTERESIS,
          max_superpressure - ENVELOPE_BUFFER,
          max_superpressure - ENVELOPE_CRITICAL_BUFFER)
  ], axis=-1)
  region = jnp.sum(
      (superpressure[..., None] >= thresholds).astype(jnp.int32), axis=-1)
  new_state = _ENVELOPE_TABLE[region, envelope_state]

  critical = jnp.logical_or(new_state == 1, new_state == 4)
  blocked = jnp.logical_or(new_state == 2, new_state == 3)
  effective = jnp.where(
      critical, UP,
      jnp.where(jnp.logical_and(blocked, action == DOWN), STAY, action))
  return new_state, effective


def envelope_nav_is_paused(envelope_state):
  return envelope_state != 0


# --- Altitude safety (altitude_safety.py:35-112) ---
ALTITUDE_MIN_M = 50_000.0 * constants.METERS_PER_FOOT
ALTITUDE_BUFFER_M = 500.0 * constants.METERS_PER_FOOT
ALTITUDE_HYSTERESIS_M = 500.0 * constants.METERS_PER_FOOT

# States: 0 NOMINAL, 1 LOW, 2 VERY_LOW. Rows: altitude region
# (very_low, low, low_nominal, nominal); columns: previous state.
_ALTITUDE_TABLE = jnp.asarray([
    [2, 2, 2],
    [1, 1, 1],
    [0, 1, 1],  # low_nominal: stays LOW if was LOW/VERY_LOW
    [0, 0, 0],
], jnp.int32)


def altitude_safety(altitude_state, action, atmosphere_params, pressure):
  """Returns (new_state, effective_action)."""
  altitude_m, _, _ = atmosphere_lib.at_pressure(atmosphere_params, pressure)
  region = ((altitude_m >= ALTITUDE_MIN_M).astype(jnp.int32) +
            (altitude_m >= ALTITUDE_MIN_M + ALTITUDE_BUFFER_M).astype(
                jnp.int32) +
            (altitude_m >= ALTITUDE_MIN_M + ALTITUDE_BUFFER_M +
             ALTITUDE_HYSTERESIS_M).astype(jnp.int32))
  new_state = _ALTITUDE_TABLE[region, altitude_state]

  effective = jnp.where(
      new_state == 2, UP,
      jnp.where(jnp.logical_and(new_state == 1, action == DOWN), STAY,
                action))
  return new_state, effective


def altitude_nav_is_paused(altitude_state):
  return altitude_state != 0


# --- Power safety (power_safety.py:26-127) ---
POWER_SOC_MIN = 0.025
POWER_SOC_RESTART = 0.05
POWER_SUNRISE_HYSTERESIS_S = 30 * 60


@struct.dataclass
class PowerSafetyState:
  navigation_is_paused: jnp.ndarray  # bool
  sunrise_with_hysteresis_s: jnp.ndarray  # int32 unix seconds
  sunset_s: jnp.ndarray  # int32 unix seconds


def _advance_past(anchor_s, time_s):
  """Adds whole days to `anchor_s` until it is >= time_s.

  Matches `while date_time > anchor: anchor += 1 day`
  (power_safety.py:83-86).
  """
  delta = time_s - anchor_s
  k = jnp.where(delta > 0, (delta + 86399) // 86400, 0)
  return anchor_s + k * 86400


def power_safety(state: PowerSafetyState, action, time_s,
                 nighttime_power_load_w, battery_charge_j,
                 battery_capacity_j):
  """Returns (new PowerSafetyState, effective_action)."""
  sunrise = _advance_past(state.sunrise_with_hysteresis_s, time_s)
  sunset = _advance_past(state.sunset_s, time_s)

  paused_action = jnp.where(action == DOWN, STAY, action)
  soc = battery_charge_j / battery_capacity_j

  is_daytime = sunset < sunrise
  # Daytime branch: stay paused until soc recovers (power_safety.py:88-100).
  day_paused = jnp.logical_and(state.navigation_is_paused,
                               soc < POWER_SOC_RESTART)

  # Nighttime branch: project the charge at sunrise (power_safety.py:102-118).
  time_to_sunrise_s = (sunrise - time_s).astype(jnp.float32)
  floating_charge_j = nighttime_power_load_w * time_to_sunrise_s
  expected_soc = (battery_charge_j - floating_charge_j) / battery_capacity_j
  night_paused = jnp.logical_or(state.navigation_is_paused,
                                expected_soc < POWER_SOC_MIN)

  new_paused = jnp.where(is_daytime, day_paused, night_paused)
  effective = jnp.where(new_paused, paused_action, action)

  return PowerSafetyState(
      navigation_is_paused=new_paused,
      sunrise_with_hysteresis_s=sunrise,
      sunset_s=sunset), effective
