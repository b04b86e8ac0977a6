"""The Balloon RL environment as pure reset/step functions.

Re-design of the reference env stack (``env/balloon_env.py``,
``env/balloon_arena.py``): instead of stateful Arena/Env objects, the whole
simulator state is one `EnvState` pytree and

    reset(key, params, field_fn)            -> (EnvState, obs)
    step(params, state, action)             -> (EnvState, obs, reward, done, info)

are pure jittable functions, vmappable over envs. Episode-boundary resets
are the harness's job (terminal balloons freeze; see balloon.simulate_step),
which keeps the hot step free of VAE decodes and sunrise searches.

`EnvState` doubles as the checkpointable simulator state (reference
`SimulatorState` get/set, balloon_arena.py:204-214): it is a pytree of
arrays, so orbax can save/restore it directly.
"""

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ble_tpu.env import atmosphere as atmosphere_lib
from ble_tpu.env import balloon as balloon_lib
from ble_tpu.env import features as features_lib
from ble_tpu.env import safety
from ble_tpu.env import solar
from ble_tpu.env import stable_init
from ble_tpu.env import wind_field as wind_field_lib
from ble_tpu.env import wind_gp
from ble_tpu.utils import constants
from ble_tpu.utils import sampling
from ble_tpu.utils import transforms

NUM_ACTIONS = 3
OBSERVATION_DIM = features_lib.NUM_FEATURES


@struct.dataclass
class EnvParams:
  """Environment configuration (reference BalloonEnv gin params)."""
  balloon: balloon_lib.BalloonParams = struct.field(
      default_factory=balloon_lib.BalloonParams)
  station_keeping_radius_km: float = 50.0
  reward_dropoff: float = 0.4
  reward_halflife_km: float = 100.0
  # Store the forecast grid in f32 instead of the bf16 training default
  # (parity/eval mode; measured StationSeeker action-flip rate between
  # the two is in docs/benchmarks.md). Static: selects dtypes at trace
  # time.
  wind_field_f32: bool = struct.field(pytree_node=False, default=False)
  # Windowed field-slab cache (wind_field.refresh_slab): per-step queries
  # read a (4, 4) lat/lng window instead of the full 21x21 grid -- the
  # grid read is the env step's largest HBM stream (docs/benchmarks.md
  # roofline). Exact while the balloon moves less than one 50 km grid
  # cell between refreshes: with `field_cache_every=8` agent steps that
  # is sustained wind < ~34.7 m/s, far above stratospheric speeds.
  # Production scan drivers (bench.py, learner.run_episode_chunk,
  # eval_lib's chunked episode scan) all use the cond-free cadence:
  # step with refresh='never' + an unconditional refresh_field_cache at
  # every field_cache_every-step boundary of a nested scan. Single
  # env.step calls outside those drivers re-center every step (correct,
  # no speedup).
  field_cache: bool = struct.field(pytree_node=False, default=False)
  field_cache_every: int = struct.field(pytree_node=False, default=8)


@struct.dataclass
class EnvState:
  balloon: balloon_lib.BalloonState
  atmosphere: atmosphere_lib.AtmosphereParams
  wind: wind_field_lib.WindFieldState
  gp: wind_gp.WindGPState
  # Next sunrise/sunset at the balloon (feature solar cycle; advanced by
  # whole days within an episode like power_safety.py:83-86).
  sunrise_s: jnp.ndarray
  sunset_s: jnp.ndarray
  # Ground-truth wind at the balloon's current position/time. This is both
  # the last measurement and next step's advection wind (the reference
  # looks the same value up twice; balloon_arena.py:194,222).
  wind_u: jnp.ndarray
  wind_v: jnp.ndarray
  steps: jnp.ndarray  # int32 agent steps taken this episode.


class StepOutput(NamedTuple):
  state: EnvState
  observation: jnp.ndarray
  reward: jnp.ndarray
  done: jnp.ndarray
  info: dict


def reward_function(params: EnvParams, state: balloon_lib.BalloonState,
                    excess: jnp.ndarray) -> jnp.ndarray:
  """Perciatelli reward (reference balloon_env.py:44-102)."""
  distance_km = jnp.sqrt(state.x_m ** 2 + state.y_m ** 2) / 1000.0
  radius = params.station_keeping_radius_km
  outside = params.reward_dropoff * jnp.exp(
      -0.69314718056 / params.reward_halflife_km * (distance_km - radius))
  reward = jnp.where(distance_km <= radius, 1.0, outside)

  # Power regularization when descending without excess energy.
  scale = transforms.linear_rescale_with_saturation(state.acs_power_w, 100.0,
                                                    300.0)
  multiplier = 0.95 - 0.3 * scale
  apply_penalty = jnp.logical_and(state.last_command == safety.DOWN, ~excess)
  return jnp.where(apply_penalty, reward * multiplier, reward)


def _observe_and_features(params: EnvParams, state: EnvState,
                          gp_enabled=True):
  """GP-observes the cached measurement and builds the feature vector
  (reference balloon_arena.py:179-202 observe + get_features).

  `gp_enabled=False` skips the GP insert -- used for frozen post-terminal
  balloons, whose exact-duplicate measurements would destabilize the
  incremental inverse (see wind_gp.observe)."""
  b = state.balloon
  elapsed = b.time_elapsed_s.astype(jnp.float32)
  forecast_u, forecast_v = wind_field_lib.get_forecast(
      state.wind, b.x_m, b.y_m, b.pressure_pa, elapsed)
  gp = wind_gp.observe(state.gp, b.x_m, b.y_m, b.pressure_pa, elapsed,
                       state.wind_u - forecast_u, state.wind_v - forecast_v,
                       enabled=gp_enabled)
  state = state.replace(gp=gp)
  obs = features_lib.get_features(params.balloon, b, gp, state.wind,
                                  state.atmosphere, state.sunrise_s,
                                  state.sunset_s)
  return state, obs


def _advance_past(anchor_s, time_s):
  delta = time_s - anchor_s
  k = jnp.where(delta > 0, (delta + 86399) // 86400, 0)
  return anchor_s + k * 86400


def reset(key: jax.Array, params: EnvParams,
          field_fn: Callable[[jax.Array], jnp.ndarray]):
  """Fresh episode (reference balloon_arena.py:161-182,228-268).

  Args:
    key: per-env PRNG key.
    params: environment parameters.
    field_fn: key -> (21, 21, 10, 9, 2) forecast grid (e.g. a VAE decode or
      a procedural test field).

  Returns:
    (EnvState, observation).
  """
  wind_key = jax.random.split(key, 7)[6]
  forecast_key = jax.random.split(wind_key)[1]
  field = field_fn(forecast_key)
  return reset_from_field(key, params, field)


def reset_from_field(key: jax.Array, params: EnvParams, field: jnp.ndarray):
  """`reset` with the forecast grid already decoded.

  Splits `key` exactly like `reset` (the forecast sub-key is simply unused),
  so `reset(key, p, f) == reset_from_field(key, p, f(forecast_key))`. This
  is the auto-reset entry point: the harness batch-decodes fields OUTSIDE
  the step scan (a VAE decode is one big matmul batch) and resets terminal
  envs in place with pure jnp math (reference instead constructs fresh
  Python arena objects per episode, balloon_arena.py:161).
  """
  (atmo_key, time_key, offset_key, loc_key, pressure_key, ir_key,
   wind_key) = jax.random.split(key, 7)

  atmosphere = atmosphere_lib.reset(atmo_key)
  t0 = sampling.sample_time(time_key)
  x_m, y_m = sampling.sample_initial_offset(offset_key)
  center_lat, center_lng = sampling.sample_location(loc_key)
  pressure = sampling.sample_pressure(pressure_key, atmosphere)
  upwelling_ir = sampling.sample_upwelling_infrared(ir_key)

  noise_key, _forecast_key = jax.random.split(wind_key)
  field = field.astype(jnp.float32 if params.wind_field_f32
                       else wind_field_lib.FIELD_DTYPE)
  seeds, offsets = wind_field_lib.reset_noise(noise_key)
  wind = wind_field_lib.WindFieldState(field=field, noise_seeds=seeds,
                                       noise_offsets=offsets)
  if params.field_cache:
    wind = wind_field_lib.refresh_slab(wind, x_m, y_m)
  return init_state(params, atmosphere, t0, x_m, y_m, center_lat,
                    center_lng, pressure, upwelling_ir, wind)


def init_state(params: EnvParams, atmosphere, t0, x_m, y_m, center_lat,
               center_lng, pressure, upwelling_ir,
               wind: wind_field_lib.WindFieldState):
  """Builds the initial EnvState from sampled initial conditions
  (the stable-init + sunrise/sunset + first-observation tail of
  reference balloon_arena.py:161-182,259-268)."""
  balloon = balloon_lib.BalloonState(
      center_lat_rad=center_lat,
      center_lng_rad=center_lng,
      x_m=x_m,
      y_m=y_m,
      pressure_pa=pressure,
      time_s=t0,
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
      battery_charge_j=jnp.float32(2905.6 * constants.WATT_HOURS_TO_JOULES),
      last_command=jnp.int32(safety.STAY),
      status=jnp.int32(balloon_lib.STATUS_OK),
      upwelling_infrared_w_m2=upwelling_ir,
      power_safety=safety.PowerSafetyState(
          navigation_is_paused=jnp.bool_(False),
          sunrise_with_hysteresis_s=jnp.int32(0),  # Filled below.
          sunset_s=jnp.int32(0)),
      envelope_safety_state=jnp.int32(0),
      altitude_safety_state=jnp.int32(0))
  balloon = stable_init.cold_start_to_stable_params(params.balloon, balloon,
                                                    atmosphere)

  # Sunrise/sunset at the initial position (power_safety.py:40-50).
  lat, lng = balloon_lib.latlng(balloon)
  sunrise, sunset = solar.next_sunrise_sunset(lat, lng, t0)
  balloon = balloon.replace(power_safety=safety.PowerSafetyState(
      navigation_is_paused=jnp.bool_(False),
      sunrise_with_hysteresis_s=sunrise + safety.POWER_SUNRISE_HYSTERESIS_S,
      sunset_s=sunset))

  wind_u, wind_v = wind_field_lib.get_ground_truth(wind, balloon.x_m,
                                                   balloon.y_m,
                                                   balloon.pressure_pa, 0.0)

  state = EnvState(
      balloon=balloon,
      atmosphere=atmosphere,
      wind=wind,
      gp=wind_gp.init(),
      sunrise_s=sunrise,
      sunset_s=sunset,
      wind_u=wind_u,
      wind_v=wind_v,
      steps=jnp.int32(0))
  state, obs = _observe_and_features(params, state)
  return state, obs


def step(params: EnvParams, state: EnvState, action,
         refresh: str = 'auto') -> StepOutput:
  """One agent step (reference balloon_env.py:157-190 +
  balloon_arena.py:184-202).

  refresh: 'auto' re-centers the field slab every step (correct,
  unamortized); 'never' is for scan drivers that re-center at their own
  chunk boundaries (eval_lib's cadence)."""
  if state.wind.slab is not None and refresh != 'never':
    state = state.replace(wind=wind_field_lib.refresh_slab(
        state.wind, state.balloon.x_m, state.balloon.y_m))
  balloon = balloon_lib.simulate_step(
      params.balloon, state.atmosphere, state.balloon, state.wind_u,
      state.wind_v, jnp.asarray(action, jnp.int32))
  return _post_physics(params, state, balloon)


def refresh_field_cache(state: EnvState) -> EnvState:
  """Re-centers every env's field slab (wind_field.refresh_slab) on its
  balloon. No-op-free: call only when the cache is enabled. Scan drivers
  that manage the cadence themselves (nested chunk scans -- the
  cond-free form; see bench.py) call this at chunk boundaries and pass
  `refresh='never'` to step_batched."""
  return state.replace(wind=jax.vmap(wind_field_lib.refresh_slab)(
      state.wind, state.balloon.x_m, state.balloon.y_m))


def step_batched(params: EnvParams, state: EnvState, actions,
                 physics: str = 'auto', global_step=None,
                 refresh: str = 'auto') -> StepOutput:
  """Batched agent step with the physics backend made explicit.

  `state` leaves carry a leading env axis (from a vmapped reset).

  physics: 'fused' runs the substep loop as ONE Pallas kernel
  (ops/pallas_physics.py) -- the production TPU path; 'xla' vmaps the
  scan-based path; 'auto' picks by backend. Everything after physics
  (wind measurement, GP update, features, reward) is identical vmapped
  code in all cases.

  global_step: scalar step counter from the caller's scan, driving the
  field-slab refresh cadence (EnvParams.field_cache). None with the
  cache enabled = refresh every step (correct but unamortized).
  refresh: 'auto' (cadence here, via lax.cond on global_step), or
  'never' for drivers that call refresh_field_cache at their own chunk
  boundaries (avoids the cond entirely).
  """
  if physics == 'auto':
    physics = 'fused' if jax.default_backend() == 'tpu' else 'xla'
  actions = jnp.asarray(actions, jnp.int32)
  if state.wind.slab is not None and refresh != 'never':
    if global_step is None:
      state = refresh_field_cache(state)
    else:
      state = jax.lax.cond(
          jnp.asarray(global_step) % params.field_cache_every == 0,
          refresh_field_cache, lambda s: s, state)
  if physics == 'fused':
    from ble_tpu.ops import pallas_physics
    balloon = pallas_physics.simulate_step_fused(
        params.balloon, state.atmosphere, state.balloon, state.wind_u,
        state.wind_v, actions)
  else:
    balloon = jax.vmap(
        lambda a, b, u, v, act: balloon_lib.simulate_step(
            params.balloon, a, b, u, v, act))(
                state.atmosphere, state.balloon, state.wind_u, state.wind_v,
                actions)
  if jax.default_backend() == 'tpu':
    return _post_physics_batched(params, state, balloon)
  return jax.vmap(functools.partial(_post_physics, params))(state, balloon)


def rollout_window(params: EnvParams, state: EnvState, actions,
                   physics: str = 'auto') -> StepOutput:
  """K open-loop env steps with the GP inverse resident across the window.

  The env dynamics (positions, winds) do not depend on the GP/features --
  those only OBSERVE the trajectory -- so when the K actions are known up
  front (scripted benches, replay re-computation, offline rollouts) the
  step pipeline can be staged:

    1. a wide scan runs physics + wind interpolation + noise for all K
       steps (full-width elementwise kernels, one (10, 2) field column
       per step reused for both wind lookups);
    2. ops/pallas_gp_window consumes the (K, E) trajectory in ONE kernel
       whose per-env (CAP, CAP) inverse stays VMEM-resident for the
       whole window -- the per-step kinv HBM stream (the honest step's
       bandwidth floor, docs/benchmarks.md) amortizes to 1/K;
    3. a wide pass assembles features/rewards for all K steps.

  Produces exactly what K sequential `step_batched` calls produce
  (tests/test_rollout_window.py pins obs/reward/state parity); actions
  that depend on per-step observations (training actors) must use
  `step_batched` instead.

  Args:
    params: EnvParams.
    state: batched EnvState (leaves lead with (E,)).
    actions: (K, E) int32 action sequence.
    physics: as `step_batched`.

  Returns:
    StepOutput with the FINAL state and (K, E)-leading observation /
    reward / done / info stacks.
  """
  from ble_tpu.ops import pallas_gp_observe
  from ble_tpu.ops import pallas_gp_window
  if physics == 'auto':
    physics = 'fused' if jax.default_backend() == 'tpu' else 'xla'
  actions = jnp.asarray(actions, jnp.int32)

  atmosphere = state.atmosphere
  wind = state.wind

  def phase1(carry, action):
    balloon, wind_u, wind_v, sunrise_s, sunset_s = carry
    was_ok = balloon.status == balloon_lib.STATUS_OK
    if physics == 'fused':
      from ble_tpu.ops import pallas_physics
      balloon = pallas_physics.simulate_step_fused(
          params.balloon, atmosphere, balloon, wind_u, wind_v, action)
    else:
      balloon = jax.vmap(
          lambda a, b, u, v, act: balloon_lib.simulate_step(
              params.balloon, a, b, u, v, act))(
                  atmosphere, balloon, wind_u, wind_v, action)
    elapsed = balloon.time_elapsed_s.astype(jnp.float32)
    col = jax.vmap(wind_field_lib.effective_column)(
        wind, balloon.x_m, balloon.y_m, elapsed)  # (E, 10, 2)
    wp = wind_field_lib._axis_weights(
        balloon.pressure_pa, wind_field_lib.PRESSURE_SLICES,
        wind_field_lib.MIN_PRESSURE_PA, wind_field_lib.MAX_PRESSURE_PA)
    forecast_uv = jnp.einsum('en,enc->ec', wp, col)
    noise_u, noise_v = jax.vmap(wind_field_lib.get_noise)(
        wind, balloon.x_m, balloon.y_m, balloon.pressure_pa, elapsed)
    wind_u = forecast_uv[:, 0] + noise_u
    wind_v = forecast_uv[:, 1] + noise_v
    sunrise_s = _advance_past(sunrise_s, balloon.time_s)
    sunset_s = _advance_past(sunset_s, balloon.time_s)
    ys = (balloon, col, noise_u, noise_v, was_ok, sunrise_s, sunset_s)
    return (balloon, wind_u, wind_v, sunrise_s, sunset_s), ys

  carry = (state.balloon, state.wind_u, state.wind_v, state.sunrise_s,
           state.sunset_s)
  carry, (balloons, cols, noise_u, noise_v, was_ok, sunrises,
          sunsets) = jax.lax.scan(phase1, carry, actions)
  balloon_f, wind_u_f, wind_v_f, sunrise_f, sunset_f = carry

  # Phase 2: the K-step GP kernel.
  elapsed_seq = balloons.time_elapsed_s.astype(jnp.float32)  # (K, E)
  obs_seq = pallas_gp_observe._pack_obs(
      balloons.x_m, balloons.y_m, balloons.pressure_pa, elapsed_seq,
      noise_u, noise_v, was_ok)  # (K, E, 8)
  gp, level = pallas_gp_window.window(state.gp, obs_seq)
  error_means = level[..., 0:2]  # (K, E, L, 2)
  deviations = level[..., 2]

  # Phase 3: features + rewards for all K steps at once.
  forecast_levels = jnp.einsum(
      'ln,kenc->kelc', features_lib._LEVEL_PRESSURE_WEIGHTS, cols)
  k, e = actions.shape
  flat = lambda t: jax.tree.map(
      lambda x: x.reshape((k * e,) + x.shape[2:]), t)
  atmo_rep = jax.tree.map(
      lambda x: jnp.broadcast_to(x[None], (k,) + x.shape), atmosphere)
  obs = jax.vmap(functools.partial(features_lib.get_features_precomputed,
                                   params.balloon))(
      flat(balloons), flat(atmo_rep), flat(sunrises), flat(sunsets),
      flat(error_means), flat(deviations), flat(forecast_levels))
  obs = obs.reshape(k, e, -1)

  excess = balloon_lib.excess_energy(params.balloon, balloons)
  reward = reward_function(params, balloons, excess)
  done = balloons.status != balloon_lib.STATUS_OK
  info = {
      'out_of_power': balloons.status == balloon_lib.STATUS_OUT_OF_POWER,
      'envelope_burst': balloons.status == balloon_lib.STATUS_BURST,
      'zeropressure': balloons.status == balloon_lib.STATUS_ZEROPRESSURE,
      'time_elapsed_s': balloons.time_elapsed_s,
      'x_km': balloons.x_m / 1000.0,
      'y_km': balloons.y_m / 1000.0,
      'pressure_pa': balloons.pressure_pa,
      'superpressure_pa': balloons.superpressure_pa,
      'battery_soc': balloon_lib.battery_soc(params.balloon, balloons),
  }

  final = state.replace(
      balloon=balloon_f, gp=gp, wind_u=wind_u_f, wind_v=wind_v_f,
      sunrise_s=sunrise_f, sunset_s=sunset_f,
      steps=state.steps + actions.shape[0])
  return StepOutput(final, obs, reward, done, info)


def _post_physics_batched(params: EnvParams, state: EnvState,
                          balloon: balloon_lib.BalloonState) -> StepOutput:
  """Batched twin of `_post_physics` for the TPU path.

  Identical math; the only structural difference is that the GP observe
  runs through the E_BLK-blocked Pallas kernel
  (ops/pallas_gp_observe.observe_batched) on the WHOLE env batch in one
  pallas_call (one grid program per 8 envs) instead of one program per
  env via the vmap rule -- the per-program DMA setup of the 13 small
  buffers dominates at one env per program (measured; docs/benchmarks.md
  round-4 profile)."""
  from ble_tpu.ops import pallas_gp_window
  was_ok = state.balloon.status == balloon_lib.STATUS_OK
  elapsed = balloon.time_elapsed_s.astype(jnp.float32)
  # ONE field contraction serves BOTH wind lookups of the step: the
  # (10, 2) effective column at the balloon's (x, y, t) yields the
  # balloon-pressure forecast (this step's measurement / next step's
  # advection wind) AND the 181-level feature forecast via static
  # pressure weights -- bit-identical to two get_forecast calls (same
  # column, same weight formula) while halving the slab traffic. The
  # reference instead looks the wind up twice per step
  # (balloon_arena.py:184-222).
  col = jax.vmap(wind_field_lib.effective_column)(
      state.wind, balloon.x_m, balloon.y_m, elapsed)  # (E, 10, 2)
  wp = wind_field_lib._axis_weights(
      balloon.pressure_pa, wind_field_lib.PRESSURE_SLICES,
      wind_field_lib.MIN_PRESSURE_PA, wind_field_lib.MAX_PRESSURE_PA)
  forecast_uv = jnp.einsum('en,enc->ec', wp, col)
  forecast_u, forecast_v = forecast_uv[:, 0], forecast_uv[:, 1]
  noise_u, noise_v = jax.vmap(wind_field_lib.get_noise)(
      state.wind, balloon.x_m, balloon.y_m, balloon.pressure_pa, elapsed)
  # Ground truth = forecast + noise at the same point, so the GP error
  # (truth - forecast) is exactly the noise.
  wind_u = forecast_u + noise_u
  wind_v = forecast_v + noise_v

  state = state.replace(
      balloon=balloon,
      wind_u=wind_u,
      wind_v=wind_v,
      sunrise_s=_advance_past(state.sunrise_s, balloon.time_s),
      sunset_s=_advance_past(state.sunset_s, balloon.time_s),
      steps=state.steps + 1)

  # Fused observe+query: ONE kernel updates the bordered inverse AND
  # returns the 181-level posterior (kinv touched once per step instead
  # of read twice + written once; ops/pallas_gp_window).
  if balloon.x_m.shape[0] % pallas_gp_window.E_BLK:
    # Batch not blockable: fall back to the kernel pair.
    from ble_tpu.ops import pallas_gp_observe
    gp = pallas_gp_observe.observe_batched(
        state.gp, balloon.x_m, balloon.y_m, balloon.pressure_pa, elapsed,
        noise_u, noise_v, enabled=was_ok)
    error_means, deviations = jax.vmap(
        lambda g, x, y, t: wind_gp.query_column(
            g, x, y, t, features_lib.PRESSURE_LEVELS))(
                gp, balloon.x_m, balloon.y_m, elapsed)
  else:
    gp, error_means, deviations = pallas_gp_window.step(
        state.gp, balloon.x_m, balloon.y_m, balloon.pressure_pa, elapsed,
        noise_u, noise_v, enabled=was_ok)
  state = state.replace(gp=gp)
  forecast_levels = jnp.einsum(
      'ln,enc->elc', features_lib._LEVEL_PRESSURE_WEIGHTS, col)
  obs = jax.vmap(functools.partial(features_lib.get_features_precomputed,
                                   params.balloon))(
      state.balloon, state.atmosphere, state.sunrise_s, state.sunset_s,
      error_means, deviations, forecast_levels)

  excess = balloon_lib.excess_energy(params.balloon, balloon)
  reward = reward_function(params, balloon, excess)

  info = {
      'out_of_power': balloon.status == balloon_lib.STATUS_OUT_OF_POWER,
      'envelope_burst': balloon.status == balloon_lib.STATUS_BURST,
      'zeropressure': balloon.status == balloon_lib.STATUS_ZEROPRESSURE,
      'time_elapsed_s': balloon.time_elapsed_s,
      'x_km': balloon.x_m / 1000.0,
      'y_km': balloon.y_m / 1000.0,
      'pressure_pa': balloon.pressure_pa,
      'superpressure_pa': balloon.superpressure_pa,
      'battery_soc': balloon_lib.battery_soc(params.balloon, balloon),
  }
  if params.field_cache:
    info['slab_oob'] = jax.vmap(wind_field_lib.slab_oob)(
        state.wind, balloon.x_m, balloon.y_m)
  done = balloon.status != balloon_lib.STATUS_OK
  return StepOutput(state, obs, reward, done, info)


def _post_physics(params: EnvParams, state: EnvState,
                  balloon: balloon_lib.BalloonState) -> StepOutput:
  """Everything after the physics substeps (single env; vmap for batches)."""
  # The reference never steps a terminal balloon (balloon.py:288); here
  # terminal balloons freeze in place, and their (exact-duplicate)
  # measurements must not enter the GP (wind_gp.observe docstring). The
  # step where the balloon BECOMES terminal still observes, like the
  # reference's final arena.step.
  was_ok = state.balloon.status == balloon_lib.STATUS_OK
  # New measurement at the new position/time.
  elapsed = balloon.time_elapsed_s.astype(jnp.float32)
  wind_u, wind_v = wind_field_lib.get_ground_truth(
      state.wind, balloon.x_m, balloon.y_m, balloon.pressure_pa, elapsed)

  state = state.replace(
      balloon=balloon,
      wind_u=wind_u,
      wind_v=wind_v,
      sunrise_s=_advance_past(state.sunrise_s, balloon.time_s),
      sunset_s=_advance_past(state.sunset_s, balloon.time_s),
      steps=state.steps + 1)

  state, obs = _observe_and_features(params, state, gp_enabled=was_ok)

  excess = balloon_lib.excess_energy(params.balloon, balloon)
  reward = reward_function(params, balloon, excess)

  out_of_power = balloon.status == balloon_lib.STATUS_OUT_OF_POWER
  burst = balloon.status == balloon_lib.STATUS_BURST
  zeropressure = balloon.status == balloon_lib.STATUS_ZEROPRESSURE
  done = balloon.status != balloon_lib.STATUS_OK
  info = {
      'out_of_power': out_of_power,
      'envelope_burst': burst,
      'zeropressure': zeropressure,
      'time_elapsed_s': balloon.time_elapsed_s,
      'x_km': balloon.x_m / 1000.0,
      'y_km': balloon.y_m / 1000.0,
      'pressure_pa': balloon.pressure_pa,
      'superpressure_pa': balloon.superpressure_pa,
      'battery_soc': balloon_lib.battery_soc(params.balloon, balloon),
  }
  if params.field_cache:
    # Slab speed-bound violation detector (ADVICE r3): True means the
    # clamped window query silently returned edge winds this step.
    info['slab_oob'] = wind_field_lib.slab_oob(state.wind, balloon.x_m,
                                               balloon.y_m)
  return StepOutput(state, obs, reward, done, info)


def make_field_fn(kind: str = 'generative', decoder_params=None):
  """Returns a `field_fn` for reset().

  kinds: 'generative' (VAE decode; decoder_params required),
         'static' (4-direction test field, reference wind_field.py:149-184).
  """
  if kind == 'generative':
    from ble_tpu.generative import vae
    if decoder_params is None:
      raise ValueError('generative field needs decoder_params')
    return lambda key: vae.sample_field(decoder_params, key)
  elif kind == 'static':
    return lambda key: wind_field_lib.simple_static_field()
  raise ValueError(f'unknown wind field kind: {kind}')
