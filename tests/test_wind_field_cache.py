"""Windowed field-slab cache (wind_field.refresh_slab) correctness.

The slab caches the (4, 4) lat/lng sub-grid around the balloon so per-step
queries skip the full 21x21 grid read (the env step's largest HBM stream;
docs/benchmarks.md roofline). These tests pin the cache's contract: the
cached column is EXACTLY the full-grid column (same weights, same nonzero
terms, same dtypes) while the balloon stays inside the window, including at
domain edges where both paths clamp identically.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ble_tpu.env import env as env_lib
from ble_tpu.env import wind_field as wf


def _state_with(field, key=0):
  return wf.make_state(field, jax.random.PRNGKey(key),
                       field_dtype=field.dtype)


def test_slab_column_matches_full_column():
  key = jax.random.PRNGKey(3)
  field = jax.random.normal(key, wf.GRID_SHAPE, jnp.float32) * 10.0
  state = _state_with(field)
  rng = np.random.RandomState(0)
  for _ in range(20):
    x_m = float(rng.uniform(-520e3, 520e3))
    y_m = float(rng.uniform(-520e3, 520e3))
    t_s = float(rng.uniform(0.0, 60.0 * 3600))
    # Query within ~half a cell of the refresh position: always in-window.
    dx = float(rng.uniform(-20e3, 20e3))
    dy = float(rng.uniform(-20e3, 20e3))
    cached = wf.refresh_slab(state, x_m, y_m)
    col_full = wf.effective_column(state, x_m + dx, y_m + dy, t_s)
    col_slab = wf.effective_column(cached, x_m + dx, y_m + dy, t_s)
    np.testing.assert_array_equal(np.asarray(col_slab), np.asarray(col_full))


def test_slab_valid_one_full_cell_from_refresh():
  """The documented margin: >=1 grid cell (50 km) of drift stays exact."""
  field = jax.random.normal(jax.random.PRNGKey(5), wf.GRID_SHAPE,
                            jnp.float32)
  state = _state_with(field)
  for x0 in (-480e3, -60e3, 10e3, 470e3):
    cached = wf.refresh_slab(state, x0, x0 / 2.0)
    for drift in (-49e3, -25e3, 0.0, 25e3, 49e3):
      full = wf.effective_column(state, x0 + drift, x0 / 2.0 + drift, 7200.0)
      slab = wf.effective_column(cached, x0 + drift, x0 / 2.0 + drift, 7200.0)
      np.testing.assert_array_equal(np.asarray(slab), np.asarray(full))


def test_slab_edge_clamp_matches_grid_clamp():
  """Far outside the grid both paths clamp to the boundary column."""
  field = jax.random.normal(jax.random.PRNGKey(7), wf.GRID_SHAPE,
                            jnp.float32)
  state = _state_with(field)
  for x_m, y_m in [(900e3, 900e3), (-900e3, 480e3), (490e3, -2000e3)]:
    cached = wf.refresh_slab(state, x_m, y_m)
    full = wf.effective_column(state, x_m, y_m, 0.0)
    slab = wf.effective_column(cached, x_m, y_m, 0.0)
    np.testing.assert_array_equal(np.asarray(slab), np.asarray(full))


def test_step_batched_cached_trajectory_identical():
  """24 steps of the batched env: cache on == cache off, bit for bit."""
  n = 8
  field_fn = env_lib.make_field_fn('static')
  keys = jax.random.split(jax.random.PRNGKey(11), n)
  actions = jax.random.randint(jax.random.PRNGKey(12), (24, n), 0, 3)

  def run(params):
    state, obs = jax.jit(jax.vmap(
        functools.partial(env_lib.reset, params=params,
                          field_fn=field_fn)))(keys)

    @jax.jit
    def rollout(state):
      def body(carry, xs):
        i, acts = xs
        out = env_lib.step_batched(params, carry, acts, physics='xla',
                                   global_step=i)
        return out.state, (out.observation, out.reward)
      idx = jnp.arange(24, dtype=jnp.int32)
      return jax.lax.scan(body, state, (idx, actions))

    final, (obs_seq, rew_seq) = rollout(state)
    return final, obs_seq, rew_seq, obs

  base_final, base_obs, base_rew, base_o0 = run(env_lib.EnvParams())
  c_final, c_obs, c_rew, c_o0 = run(env_lib.EnvParams(field_cache=True))

  np.testing.assert_array_equal(np.asarray(c_o0), np.asarray(base_o0))
  np.testing.assert_array_equal(np.asarray(c_obs), np.asarray(base_obs))
  np.testing.assert_array_equal(np.asarray(c_rew), np.asarray(base_rew))
  np.testing.assert_array_equal(np.asarray(c_final.balloon.x_m),
                                np.asarray(base_final.balloon.x_m))
  np.testing.assert_array_equal(np.asarray(c_final.balloon.pressure_pa),
                                np.asarray(base_final.balloon.pressure_pa))


def test_single_env_step_refreshes_every_step():
  """The single-env `step` path re-centers per step: long drift stays
  exact without any caller-side cadence."""
  params = env_lib.EnvParams(field_cache=True)
  base = env_lib.EnvParams()
  field_fn = env_lib.make_field_fn('static')
  key = jax.random.PRNGKey(21)
  s_c, o_c = env_lib.reset(key, params, field_fn)
  s_b, o_b = env_lib.reset(key, base, field_fn)
  np.testing.assert_array_equal(np.asarray(o_c), np.asarray(o_b))
  step_c = jax.jit(functools.partial(env_lib.step, params))
  step_b = jax.jit(functools.partial(env_lib.step, base))
  for i in range(12):
    out_c = step_c(s_c, i % 3)
    out_b = step_b(s_b, i % 3)
    s_c, s_b = out_c.state, out_b.state
    np.testing.assert_array_equal(np.asarray(out_c.observation),
                                  np.asarray(out_b.observation))


def test_eval_lib_cached_matches_uncached():
  """eval_lib's chunked episode scan with the slab cadence (VERDICT r3
  item 7 / ADVICE r3): field_cache on == off through build_eval_fn,
  including a non-multiple tail (per-step refresh path)."""
  from ble_tpu.agents import station_seeker
  from ble_tpu.train import eval_lib

  field_fn = env_lib.make_field_fn('static')
  seeds = jnp.arange(3, dtype=jnp.int32)

  def run(params, max_steps):
    fn = eval_lib.build_eval_fn(
        params, field_fn, lambda key: (),
        lambda state, obs, key: (state, station_seeker.pick_action(obs)),
        max_steps=max_steps)
    return jax.tree.map(np.asarray, fn(seeds))

  for max_steps in (96, 70):  # 96 = chunked; 70 = 64-chunk + 6-step tail.
    base = run(env_lib.EnvParams(), max_steps)
    cached = run(env_lib.EnvParams(field_cache=True), max_steps)
    for k in ('cumulative_reward', 'time_within_radius', 'final_timestep'):
      np.testing.assert_array_equal(cached[k], base[k], err_msg=k)


def test_eval_lib_cached_non_divisor_cadence_falls_back():
  """ADVICE r4 medium: field_cache_every that does NOT divide the GP
  REFRESH_PERIOD (64) has no sub-chunk cadence; build_eval_fn must fall
  back to per-step slab refresh instead of silently pinning the slab for
  whole 64-step chunks (which returned clamped edge winds)."""
  from ble_tpu.agents import station_seeker
  from ble_tpu.train import eval_lib

  field_fn = env_lib.make_field_fn('static')
  seeds = jnp.arange(3, dtype=jnp.int32)

  def run(params):
    fn = eval_lib.build_eval_fn(
        params, field_fn, lambda key: (),
        lambda state, obs, key: (state, station_seeker.pick_action(obs)),
        max_steps=96)
    return jax.tree.map(np.asarray, fn(seeds))

  base = run(env_lib.EnvParams())
  odd = run(env_lib.EnvParams(field_cache=True, field_cache_every=24))
  for k in ('cumulative_reward', 'time_within_radius', 'final_timestep'):
    np.testing.assert_array_equal(odd[k], base[k], err_msg=k)


def test_learner_chunk_cached_matches_uncached():
  """run_episode_chunk's nested slab cadence: training trajectory with
  field_cache on == off (agent-free comparison via the env metrics)."""
  from ble_tpu.agents import replay as replay_lib
  from ble_tpu.train import learner as learner_lib

  field_fn = env_lib.make_field_fn('static')
  cfg = learner_lib.TrainConfig(
      agent='quantile', num_envs=4, episode_length=48,
      use_marco_polo=False,
      replay=replay_lib.ReplayConfig(ring_len=64, batch_size=4))

  def run(params):
    ts = learner_lib.init_train_state(jax.random.PRNGKey(5), params,
                                      field_fn, cfg)
    # 20 steps: two 8-step cache chunks + a 4-step remainder.
    ts, metrics = jax.jit(functools.partial(
        learner_lib.run_episode_chunk, cfg, params, num_steps=20))(ts)
    return np.asarray(metrics['reward']), np.asarray(ts.env_state.balloon.x_m)

  base_r, base_x = run(env_lib.EnvParams())
  c_r, c_x = run(env_lib.EnvParams(field_cache=True))
  assert base_r.shape == (20,)
  np.testing.assert_array_equal(c_r, base_r)
  np.testing.assert_array_equal(c_x, base_x)


def test_post_physics_batched_matches_vmapped():
  """env._post_physics_batched (the TPU path with the blocked GP kernel,
  here in interpret mode) == vmap(_post_physics) on the same states."""
  import functools as ft
  from ble_tpu.env import balloon as balloon_lib

  n = 8
  params = env_lib.EnvParams()
  field_fn = env_lib.make_field_fn('static')
  keys = jax.random.split(jax.random.PRNGKey(3), n)
  state, obs = jax.jit(jax.vmap(
      ft.partial(env_lib.reset, params=params, field_fn=field_fn)))(keys)
  # One physics step to produce a fresh balloon.
  balloon = jax.vmap(lambda a, b, u, v: balloon_lib.simulate_step(
      params.balloon, a, b, u, v, jnp.int32(2)))(
          state.atmosphere, state.balloon, state.wind_u, state.wind_v)

  ref = jax.jit(jax.vmap(ft.partial(env_lib._post_physics, params)))(
      state, balloon)
  got = jax.jit(ft.partial(env_lib._post_physics_batched, params))(
      state, balloon)

  np.testing.assert_allclose(np.asarray(got.observation),
                             np.asarray(ref.observation), atol=2e-5)
  np.testing.assert_array_equal(np.asarray(got.reward),
                                np.asarray(ref.reward))
  np.testing.assert_array_equal(np.asarray(got.done), np.asarray(ref.done))
  np.testing.assert_allclose(np.asarray(got.state.gp.kinv),
                             np.asarray(ref.state.gp.kinv), atol=5e-4)
  np.testing.assert_allclose(np.asarray(got.state.gp.alpha),
                             np.asarray(ref.state.gp.alpha), atol=5e-4)
  np.testing.assert_array_equal(np.asarray(got.state.gp.active),
                                np.asarray(ref.state.gp.active))


def test_slab_oob_detector():
  """slab_oob flags pre-clamp window exits (ADVICE r3) but not
  window-edge clamps that coincide with the grid's own edge clamp."""
  field = jnp.zeros((wf.LATLNG_SLICES, wf.LATLNG_SLICES,
                     wf.PRESSURE_SLICES, wf.TIME_SLICES, 2), jnp.float32)
  state = _state_with(field)
  cached = wf.refresh_slab(state, 0.0, 0.0)  # Window centered mid-grid.
  # In-window queries: no flag.
  assert not bool(wf.slab_oob(cached, 0.0, 0.0))
  assert not bool(wf.slab_oob(cached, 40e3, -40e3))
  # >1 cell (50 km) beyond the refresh point: flagged.
  assert bool(wf.slab_oob(cached, 160e3, 0.0))
  assert bool(wf.slab_oob(cached, 0.0, -160e3))
  # At the DOMAIN edge the window clamp coincides with the grid clamp:
  # far-out queries there are not window violations.
  edge = wf.refresh_slab(state, -2000e3, 0.0)
  assert not bool(wf.slab_oob(edge, -3000e3, 0.0))
  # No slab -> never flags.
  assert not bool(wf.slab_oob(state, 1e9, 1e9))
