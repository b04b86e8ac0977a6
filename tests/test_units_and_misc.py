"""Tests for host-side units, wind utils, profiling, gym wrapper."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ble_tpu.utils import profiling
from ble_tpu.utils import units
from ble_tpu.utils import wind as wind_utils


def test_units_algebra():
  d = units.Distance(km=3.0)
  assert d.meters == 3000.0
  assert abs(units.Distance(feet=50000.0).meters - 15240.0) < 1e-6
  v = units.Velocity(mps=10.0)
  assert (v * dt.timedelta(seconds=30)).meters == 300.0
  p = units.Power(watts=100.0)
  e = p * dt.timedelta(hours=2)
  assert abs(e.watt_hours - 200.0) < 1e-9
  assert (e / units.Energy(watt_hours=100.0)) == 2.0
  assert units.relative_distance(units.Distance(m=3.0),
                                 units.Distance(m=4.0)).meters == 5.0
  t = units.datetime(2013, 1, 1)
  assert t.tzinfo is not None
  assert units.timedelta_to_hours(dt.timedelta(hours=3)) == 3.0


def test_station_keeping_winds():
  # Winds spanning all directions: feasible.
  angles = jnp.linspace(0, 2 * jnp.pi, 8, endpoint=False)
  u = 10 * jnp.cos(angles)
  v = 10 * jnp.sin(angles)
  assert bool(wind_utils.is_station_keeping_winds(u, v))
  # All winds blowing the same way: infeasible.
  assert not bool(wind_utils.is_station_keeping_winds(
      jnp.full((8,), 10.0), jnp.full((8,), 1.0)))
  # Two opposite directions only: half-plane gap is exactly pi ->
  # degenerate, not strictly inside.
  u2 = jnp.asarray([10.0, -10.0, 10.0, -10.0])
  v2 = jnp.zeros((4,))
  assert not bool(wind_utils.is_station_keeping_winds(u2, v2))


def test_mean_wind_speed():
  field = jnp.zeros((21, 21, 10, 9, 2)).at[..., 0].set(3.0).at[..., 1].set(
      4.0)
  assert abs(float(wind_utils.mean_wind_speed(field)) - 5.0) < 1e-5


def test_step_timer():
  timer = profiling.StepTimer()
  with timer.phase('a'):
    x = jnp.ones((8,)) * 2
  with timer.phase('a', sync=x):
    y = x + 1
  s = timer.summary()
  assert 'a' in s and s['a'] >= 0.0
  assert 'a:' in timer.report()


def test_gym_wrapper_static():
  from ble_tpu.env.gym_env import BalloonEnv, register_env
  env = BalloonEnv(wind_field='static', seed=3)
  obs, _ = env.reset(seed=3)
  assert obs.shape == (1099,)
  obs2, reward, terminated, truncated, info = env.step(1)
  assert obs2.shape == (1099,)
  assert 0.0 <= reward <= 1.0
  assert isinstance(terminated, bool) and truncated is False
  assert 'time_elapsed_s' in info
  assert env.action_space.n == 3
  assert env.observation_space.shape == (1099,)
  # Determinism through the wrapper.
  env.reset(seed=3)
  obs3, r3, *_ = env.step(1)
  assert r3 == reward
  register_env()
  import gymnasium as gym
  env2 = gym.spec('BalloonLearningEnvironment-v0')
  assert env2 is not None
