"""Balloon physics tests: invariants from the reference test-suite
(SURVEY.md section 4): moves with wind, rises when light / sinks when
heavy, terminal statuses, stable init equilibrium, safety layer behavior."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ble_tpu.env import atmosphere as atmosphere_lib
from ble_tpu.env import balloon as balloon_lib
from ble_tpu.env import safety
from ble_tpu.env import stable_init
from ble_tpu.env import solar
from ble_tpu.env import thermal
from ble_tpu.utils import constants
from ble_tpu.utils import time_lib


def _make_balloon(pressure=9000.0, time_tuple=(2013, 6, 1, 12), x_m=0.0,
                  y_m=0.0, lat_deg=5.0, lng_deg=10.0, upwelling=280.0,
                  soc=0.95, atmo=None, stable=True):
  params = balloon_lib.BalloonParams()
  if atmo is None:
    atmo = atmosphere_lib.make(jnp.float32(0.3))
  t0 = time_lib.unix_seconds_from_datetime(
      dt.datetime(*time_tuple, tzinfo=dt.timezone.utc))
  state = balloon_lib.BalloonState(
      center_lat_rad=jnp.radians(jnp.float32(lat_deg)),
      center_lng_rad=jnp.radians(jnp.float32(lng_deg)),
      x_m=jnp.float32(x_m),
      y_m=jnp.float32(y_m),
      pressure_pa=jnp.float32(pressure),
      time_s=jnp.int32(t0),
      time_elapsed_s=jnp.int32(0),
      ambient_temperature_k=jnp.float32(206.0),
      internal_temperature_k=jnp.float32(206.0),
      mols_air=jnp.float32(0.0),
      envelope_volume_m3=jnp.float32(1804.0),
      superpressure_pa=jnp.float32(0.0),
      acs_power_w=jnp.float32(0.0),
      acs_mass_flow_kg_s=jnp.float32(0.0),
      solar_charging_w=jnp.float32(0.0),
      power_load_w=jnp.float32(0.0),
      battery_charge_j=jnp.float32(
          soc * 3058.56 * constants.WATT_HOURS_TO_JOULES),
      last_command=jnp.int32(safety.STAY),
      status=jnp.int32(balloon_lib.STATUS_OK),
      upwelling_infrared_w_m2=jnp.float32(upwelling),
      power_safety=safety.PowerSafetyState(
          navigation_is_paused=jnp.bool_(False),
          sunrise_with_hysteresis_s=jnp.int32(t0 + 6 * 3600),
          sunset_s=jnp.int32(t0 + 18 * 3600)),
      envelope_safety_state=jnp.int32(0),
      altitude_safety_state=jnp.int32(0))
  if stable:
    state = stable_init.cold_start_to_stable_params(params, state, atmo)
  return params, atmo, state


def test_stable_init_is_equilibrium():
  params, atmo, state = _make_balloon()
  # dT/dt at the solved internal temperature should be ~0.
  lat, lng = balloon_lib.latlng(state)
  el, _, flux = solar.solar_calculator(lat, lng, state.time_s)
  dT = thermal.d_balloon_temperature_dt(
      params.envelope_volume_base, params.envelope_mass,
      state.internal_temperature_k, state.ambient_temperature_k,
      state.pressure_pa, el, flux, state.upwelling_infrared_w_m2)
  assert abs(float(dT)) < 1e-4
  # Superpressure is positive (inflated) for a sensible init.
  assert float(state.superpressure_pa) > 0.0
  # Buoyancy near-balance: one STAY step drifts pressure only mildly (the
  # reference's closed-form mols_air uses envelope_volume_base, so the
  # inflated balloon starts slightly buoyant; stable_init.py:85-91).
  stepped = balloon_lib.simulate_step(params, atmo, state, 0.0, 0.0,
                                      safety.STAY)
  assert abs(float(stepped.pressure_pa) - float(state.pressure_pa)) < 400.0


def test_moves_with_wind():
  params, atmo, state = _make_balloon()
  stepped = balloon_lib.simulate_step(params, atmo, state, 5.0, -3.0,
                                      safety.STAY)
  assert abs(float(stepped.x_m) - 5.0 * 180.0) < 1.0
  assert abs(float(stepped.y_m) + 3.0 * 180.0) < 1.0
  assert int(stepped.time_elapsed_s) == 180
  assert int(stepped.time_s) - int(state.time_s) == 180


@pytest.mark.slow
def test_down_increases_pressure_up_decreases():
  params, atmo, state = _make_balloon()
  p0 = float(state.pressure_pa)
  down = state
  up = state
  for _ in range(10):
    down = balloon_lib.simulate_step(params, atmo, down, 0.0, 0.0,
                                     safety.DOWN)
    up = balloon_lib.simulate_step(params, atmo, up, 0.0, 0.0, safety.UP)
  assert float(down.pressure_pa) > p0 + 20.0  # Descending: higher pressure.
  assert float(up.pressure_pa) < p0 - 20.0  # Ascending: lower pressure.
  # DOWN pumps air in; UP vents it out.
  assert float(down.mols_air) > float(state.mols_air)


def test_acs_power_usage():
  params, atmo, state = _make_balloon(time_tuple=(2013, 6, 1, 0))  # Night.
  down = balloon_lib.simulate_step(params, atmo, state, 0.0, 0.0,
                                   safety.DOWN)
  stay = balloon_lib.simulate_step(params, atmo, state, 0.0, 0.0,
                                   safety.STAY)
  # Descending costs ACS power on top of the hotel load.
  assert float(down.battery_charge_j) < float(stay.battery_charge_j)
  assert float(down.acs_power_w) > 0.0
  assert float(stay.acs_power_w) == 0.0


def test_battery_discharges_at_night_charges_in_day():
  params, atmo, state = _make_balloon(time_tuple=(2013, 6, 1, 2), soc=0.5)
  night = balloon_lib.simulate_step(params, atmo, state, 0.0, 0.0,
                                    safety.STAY)
  assert float(night.battery_charge_j) < float(state.battery_charge_j)
  assert float(night.solar_charging_w) == 0.0

  params, atmo, day_state = _make_balloon(time_tuple=(2013, 6, 1, 16),
                                          lng_deg=10.0, soc=0.5)
  day = balloon_lib.simulate_step(params, atmo, day_state, 0.0, 0.0,
                                  safety.STAY)
  assert float(day.solar_charging_w) > 0.0


def test_burst_status_on_overpressure():
  params, atmo, state = _make_balloon()
  # Force an absurdly high superpressure by inflating mols_air hugely.
  state = state.replace(mols_air=jnp.float32(60000.0))
  stepped = balloon_lib.simulate_step(params, atmo, state, 0.0, 0.0,
                                      safety.STAY)
  assert int(stepped.status) == balloon_lib.STATUS_BURST


def test_frozen_after_terminal():
  params, atmo, state = _make_balloon()
  state = state.replace(status=jnp.int32(balloon_lib.STATUS_BURST))
  stepped = balloon_lib.simulate_step(params, atmo, state, 10.0, 0.0,
                                      safety.DOWN)
  assert float(stepped.x_m) == float(state.x_m)
  assert int(stepped.time_elapsed_s) == int(state.time_elapsed_s)


def test_out_of_power_terminal():
  params, atmo, state = _make_balloon(time_tuple=(2013, 6, 1, 2), soc=0.001)
  stepped = state
  for _ in range(5):
    stepped = balloon_lib.simulate_step(params, atmo, stepped, 0.0, 0.0,
                                        safety.STAY)
  assert int(stepped.status) == balloon_lib.STATUS_OUT_OF_POWER


def test_vmap_batch_step():
  params, atmo, state = _make_balloon()
  batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (8,) + x.shape), state)
  atmos = jax.tree.map(lambda x: jnp.broadcast_to(x, (8,) + x.shape), atmo)
  actions = jnp.asarray([0, 1, 2, 0, 1, 2, 0, 1])
  stepped = jax.vmap(
      lambda a, s, act: balloon_lib.simulate_step(params, a, s, 1.0, 1.0,
                                                  act))(atmos, batch, actions)
  assert stepped.pressure_pa.shape == (8,)
  p = np.asarray(stepped.pressure_pa)
  # DOWN (0) ends at higher pressure than UP (2).
  assert p[0] > p[2]


# --- Safety layer behavior (references: power_safety_test, envelope_..., ...)


def test_envelope_safety_critical_forces_up():
  new_state, act = safety.envelope_safety(jnp.int32(0), jnp.int32(safety.DOWN),
                                          jnp.float32(100.0),
                                          jnp.float32(2380.0))
  assert int(new_state) == 1  # LOW_CRITICAL
  assert int(act) == safety.UP


def test_envelope_safety_low_blocks_down():
  new_state, act = safety.envelope_safety(jnp.int32(0), jnp.int32(safety.DOWN),
                                          jnp.float32(200.0),
                                          jnp.float32(2380.0))
  assert int(new_state) == 2  # LOW
  assert int(act) == safety.STAY
  # STAY passes through.
  _, act2 = safety.envelope_safety(jnp.int32(0), jnp.int32(safety.STAY),
                                   jnp.float32(200.0), jnp.float32(2380.0))
  assert int(act2) == safety.STAY


def test_envelope_safety_hysteresis():
  # From LOW at sp=270 (low_nominal region): stays LOW.
  st, _ = safety.envelope_safety(jnp.int32(2), jnp.int32(safety.STAY),
                                 jnp.float32(270.0), jnp.float32(2380.0))
  assert int(st) == 2
  # From NOMINAL at 270: stays NOMINAL.
  st, _ = safety.envelope_safety(jnp.int32(0), jnp.int32(safety.STAY),
                                 jnp.float32(270.0), jnp.float32(2380.0))
  assert int(st) == 0
  # Above the hysteresis band: returns to NOMINAL from LOW.
  st, _ = safety.envelope_safety(jnp.int32(2), jnp.int32(safety.STAY),
                                 jnp.float32(400.0), jnp.float32(2380.0))
  assert int(st) == 0


def test_altitude_safety_forces_up_below_floor():
  atmo = atmosphere_lib.make(jnp.float32(0.5))
  low_pressure, _, _ = atmosphere_lib.at_height(
      atmo, jnp.float32(safety.ALTITUDE_MIN_M - 100.0))
  st, act = safety.altitude_safety(jnp.int32(0), jnp.int32(safety.DOWN), atmo,
                                   low_pressure)
  assert int(st) == 2  # VERY_LOW
  assert int(act) == safety.UP
  ok_pressure, _, _ = atmosphere_lib.at_height(
      atmo, jnp.float32(safety.ALTITUDE_MIN_M + 1000.0))
  st, act = safety.altitude_safety(jnp.int32(0), jnp.int32(safety.DOWN), atmo,
                                   ok_pressure)
  assert int(st) == 0
  assert int(act) == safety.DOWN


def test_power_safety_pauses_at_night_with_low_battery():
  t = 1_300_000_000
  state = safety.PowerSafetyState(
      navigation_is_paused=jnp.bool_(False),
      sunrise_with_hysteresis_s=jnp.int32(t + 8 * 3600),
      sunset_s=jnp.int32(t + 20 * 3600))  # sunset > sunrise => night.
  capacity = 3058.56 * 3600.0
  # Battery can't cover 8h of night load with 2.5% margin.
  charge = 183.7 * 8 * 3600.0 * 1.01
  new_state, act = safety.power_safety(state, jnp.int32(safety.DOWN),
                                       jnp.int32(t), jnp.float32(183.7),
                                       jnp.float32(charge),
                                       jnp.float32(capacity))
  assert bool(new_state.navigation_is_paused)
  assert int(act) == safety.STAY
  # Plenty of battery: not paused.
  new_state, act = safety.power_safety(state, jnp.int32(safety.DOWN),
                                       jnp.int32(t), jnp.float32(183.7),
                                       jnp.float32(capacity * 0.9),
                                       jnp.float32(capacity))
  assert not bool(new_state.navigation_is_paused)
  assert int(act) == safety.DOWN


def test_power_safety_daytime_resume_hysteresis():
  t = 1_300_000_000
  state = safety.PowerSafetyState(
      navigation_is_paused=jnp.bool_(True),
      sunrise_with_hysteresis_s=jnp.int32(t + 20 * 3600),
      sunset_s=jnp.int32(t + 8 * 3600))  # sunset < sunrise => day.
  capacity = 3058.56 * 3600.0
  # soc 3% < restart threshold 5%: stay paused.
  st, act = safety.power_safety(state, jnp.int32(safety.DOWN), jnp.int32(t),
                                jnp.float32(183.7),
                                jnp.float32(0.03 * capacity),
                                jnp.float32(capacity))
  assert bool(st.navigation_is_paused)
  assert int(act) == safety.STAY
  # soc 10% > restart: resume.
  st, act = safety.power_safety(state, jnp.int32(safety.DOWN), jnp.int32(t),
                                jnp.float32(183.7),
                                jnp.float32(0.10 * capacity),
                                jnp.float32(capacity))
  assert not bool(st.navigation_is_paused)
  assert int(act) == safety.DOWN
