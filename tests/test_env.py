"""End-to-end environment tests: reset/step contract, determinism, vmap,
feature vector structure (mirrors reference balloon_env_test /
features_test obligations, SURVEY.md section 4)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ble_tpu.env import balloon as balloon_lib
from ble_tpu.env import env as env_lib
from ble_tpu.env import features as features_lib
from ble_tpu.env import safety


@pytest.fixture(scope="module")
def setup():
  params = env_lib.EnvParams()
  field_fn = env_lib.make_field_fn('static')
  reset = jax.jit(functools.partial(env_lib.reset, params=params,
                                    field_fn=field_fn))
  step = jax.jit(functools.partial(env_lib.step, params))
  return params, reset, step


def test_reset_shapes_and_ranges(setup):
  _, reset, _ = setup
  state, obs = reset(jax.random.PRNGKey(0))
  assert obs.shape == (1099,)
  obs = np.asarray(obs)
  assert np.all(np.isfinite(obs))
  # Trig features in [-1, 1], the rest mostly [0, 1]; pressure ratio >= 1.
  assert np.all(obs[[3, 4, 5, 6]] >= -1.0) and np.all(obs[[3, 4, 5, 6]] <= 1.0)
  assert obs[15] >= 1.0
  assert 0.0 <= obs[0] <= 1.0
  assert abs(obs[1] - 0.95) < 0.01  # Initial battery soc.
  # One-hot last command = STAY.
  np.testing.assert_array_equal(obs[8:11], [0.0, 1.0, 0.0])
  assert int(state.balloon.status) == balloon_lib.STATUS_OK


def test_reset_deterministic(setup):
  _, reset, _ = setup
  s1, o1 = reset(jax.random.PRNGKey(42))
  s2, o2 = reset(jax.random.PRNGKey(42))
  np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
  assert float(s1.balloon.x_m) == float(s2.balloon.x_m)

  s3, o3 = reset(jax.random.PRNGKey(43))
  assert float(s1.balloon.x_m) != float(s3.balloon.x_m)


def test_step_trajectory_deterministic(setup):
  _, reset, step = setup
  def roll(seed):
    state, _ = reset(jax.random.PRNGKey(seed))
    traj = []
    for action in [2, 2, 0, 1, 0, 2]:
      state, obs, reward, done, info = step(state=state, action=action)
      traj.append((float(state.balloon.pressure_pa), float(reward)))
    return traj
  assert roll(7) == roll(7)
  assert roll(7) != roll(8)


def test_step_contract(setup):
  _, reset, step = setup
  state, _ = reset(jax.random.PRNGKey(1))
  state, obs, reward, done, info = step(state=state, action=1)
  assert obs.shape == (1099,)
  assert 0.0 <= float(reward) <= 1.0
  assert not bool(done)
  assert int(info['time_elapsed_s']) == 180
  assert int(state.steps) == 1
  # GP accumulates one observation per step (plus the reset observation).
  assert int(state.gp.count) == 2


def test_reward_inside_radius_is_one(setup):
  params, reset, step = setup
  state, _ = reset(jax.random.PRNGKey(2))
  # Teleport the balloon to the station.
  state = state.replace(balloon=state.balloon.replace(
      x_m=jnp.float32(0.0), y_m=jnp.float32(0.0)))
  state, obs, reward, done, info = step(state=state, action=1)
  if int(state.balloon.last_command) == safety.DOWN:
    pytest.skip('power penalty applies')
  assert float(reward) > 0.99


def test_reward_decays_outside_radius():
  params = env_lib.EnvParams()
  b = balloon_lib.BalloonParams()
  state_near = _fake_balloon_at(60.0)
  state_far = _fake_balloon_at(300.0)
  r_near = env_lib.reward_function(params, state_near, jnp.bool_(True))
  r_far = env_lib.reward_function(params, state_far, jnp.bool_(True))
  assert float(r_near) < 1.0
  assert float(r_far) < float(r_near)
  # Exact formula check: d=150km -> 0.4 * 2^-1 = 0.2.
  state_150 = _fake_balloon_at(150.0)
  r150 = env_lib.reward_function(params, state_150, jnp.bool_(True))
  assert abs(float(r150) - 0.2) < 1e-3


def _fake_balloon_at(distance_km):
  return balloon_lib.BalloonState(
      center_lat_rad=jnp.float32(0.0), center_lng_rad=jnp.float32(0.0),
      x_m=jnp.float32(distance_km * 1000.0), y_m=jnp.float32(0.0),
      pressure_pa=jnp.float32(9000.0), time_s=jnp.int32(1_300_000_000),
      time_elapsed_s=jnp.int32(0),
      ambient_temperature_k=jnp.float32(206.0),
      internal_temperature_k=jnp.float32(206.0),
      mols_air=jnp.float32(100.0), envelope_volume_m3=jnp.float32(1804.0),
      superpressure_pa=jnp.float32(500.0), acs_power_w=jnp.float32(0.0),
      acs_mass_flow_kg_s=jnp.float32(0.0),
      solar_charging_w=jnp.float32(0.0), power_load_w=jnp.float32(0.0),
      battery_charge_j=jnp.float32(1e7),
      last_command=jnp.int32(safety.STAY),
      status=jnp.int32(balloon_lib.STATUS_OK),
      upwelling_infrared_w_m2=jnp.float32(250.0),
      power_safety=safety.PowerSafetyState(
          navigation_is_paused=jnp.bool_(False),
          sunrise_with_hysteresis_s=jnp.int32(1_300_000_000),
          sunset_s=jnp.int32(1_300_000_000)),
      envelope_safety_state=jnp.int32(0),
      altitude_safety_state=jnp.int32(0))


def test_feature_column_centered_on_balloon(setup):
  _, reset, step = setup
  state, obs = reset(jax.random.PRNGKey(3))
  parsed = features_lib.parse(obs)
  winds = np.asarray(parsed.winds)  # (361, 3)
  valid = np.asarray(features_lib.wind_is_valid(jnp.asarray(winds)))
  # There must be some valid and some invalid levels.
  assert valid.any() and (~valid).any()
  # The valid band must be contiguous.
  idx = np.where(valid)[0]
  assert np.all(np.diff(idx) == 1)
  # Balloon level: output level 180 maps to the balloon's quantized level,
  # which is reachable in a freshly initialized balloon most of the time.
  level = int(features_lib.nearest_pressure_level(state.balloon.pressure_pa))
  lo, hi = idx[0], idx[-1]
  src_lo = lo - 180 + level
  src_hi = hi - 180 + level
  assert 0 <= src_lo <= src_hi <= 180


@pytest.mark.slow
def test_vmap_env(setup):
  params, _, _ = setup
  field_fn = env_lib.make_field_fn('static')
  keys = jax.random.split(jax.random.PRNGKey(0), 4)
  reset_b = jax.jit(jax.vmap(
      functools.partial(env_lib.reset, params=params, field_fn=field_fn)))
  step_b = jax.jit(jax.vmap(functools.partial(env_lib.step, params)))
  states, obs = reset_b(keys)
  assert obs.shape == (4, 1099)
  actions = jnp.asarray([0, 1, 2, 1])
  states, obs, rewards, dones, infos = step_b(states, actions)
  assert obs.shape == (4, 1099)
  assert rewards.shape == (4,)
  assert np.all(np.isfinite(np.asarray(obs)))
  # Envs are independent: different positions.
  assert len(set(np.asarray(states.balloon.x_m).tolist())) == 4


@pytest.mark.slow
def test_generative_field_env():
  from ble_tpu.generative import vae
  decoder_params = vae.init_decoder_params(jax.random.PRNGKey(0))
  params = env_lib.EnvParams()
  field_fn = env_lib.make_field_fn('generative', decoder_params)
  state, obs = jax.jit(
      functools.partial(env_lib.reset, params=params,
                        field_fn=field_fn))(jax.random.PRNGKey(5))
  assert obs.shape == (1099,)
  assert np.all(np.isfinite(np.asarray(obs)))
  step = jax.jit(functools.partial(env_lib.step, params))
  state, obs, reward, done, info = step(state, 1)
  assert np.all(np.isfinite(np.asarray(obs)))


def test_terminal_env_freezes_gp(setup):
  # A post-terminal balloon is frozen in place; its exact-duplicate
  # measurements must not enter the GP (they would blow up the incremental
  # inverse -- see wind_gp.observe). Count stays fixed and observations
  # stay finite under repeated stepping.
  _, reset, step = setup
  state, _ = reset(jax.random.PRNGKey(3))
  state = state.replace(balloon=state.balloon.replace(
      status=jnp.int32(balloon_lib.STATUS_OUT_OF_POWER)))
  count0 = int(state.gp.count)
  for _ in range(20):
    out = step(state, 1)
    state = out.state
  assert int(state.gp.count) == count0
  assert bool(jnp.all(jnp.isfinite(out.observation)))
  assert bool(jnp.all(jnp.isfinite(state.gp.kinv)))
