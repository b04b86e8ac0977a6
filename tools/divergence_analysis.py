"""Per-seed first-divergence analysis for the paired parity suite.

For every seed where the paired small_eval comparison
(results/parity_report.json) shows a TWR difference, this tool re-runs
BOTH runtimes closed-loop on the same world recording per-step actions
and positions, then pins down:

  - the FIRST step whose StationSeeker action differs,
  - how closely the trajectories agreed right before it (position /
    pressure deltas at step t-1), and
  - the knife-edge margin of the flipped decision: the reference agent's
    altitude-score gap between its chosen level and the ble_tpu-chosen
    level at the flip step (a gap within f32 rounding of the ~O(1)
    scores demonstrates a rounding flip, not a modeling difference).

This is the evidence VERDICT round-3 asked for behind the claim that the
divergent seeds are "single rounding action flips that fork the
trajectory; both forks are valid".

Usage (CPU; uses the reference via the compat shims):
  PYTHONPATH= JAX_PLATFORMS=cpu python tools/divergence_analysis.py \
      --report results/parity_report.json --out results/parity_divergence.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from ble_tpu import compat

compat.enable_reference_imports()

import jax
import jax.numpy as jnp
import numpy as np

from balloon_learning_environment.agents import (
    station_seeker_agent as ref_ss)
from balloon_learning_environment.env import balloon_env as ref_env_lib
from balloon_learning_environment.env import (
    grid_based_wind_field as ref_gbwf)

from ble_tpu.agents import station_seeker as my_ss
from ble_tpu.env import env as my_env
from ble_tpu.env import parity_reset as parity_reset_lib
from ble_tpu.models import loader
from tools.parity_report import _RefVaeSampler


def run_reference_episode(seed, decoder_params, max_steps=960):
  """Closed-loop reference episode; returns (actions, x_km, y_km,
  pressure, scores_per_step (T, 361))."""
  env = ref_env_lib.BalloonEnv(
      wind_field_factory=lambda: ref_gbwf.GridBasedWindField(
          _RefVaeSampler(decoder_params)))
  agent = ref_ss.StationSeekerAgent(3, (1099,))
  env.seed(seed)
  obs = env.reset()
  actions, xs, ys, ps, obs_log = [], [], [], [], []
  action = agent.begin_episode(obs)
  for _ in range(max_steps):
    obs_log.append(np.asarray(obs, np.float32))
    actions.append(int(action))
    b = env.get_simulator_state().balloon_state
    xs.append(b.x.kilometers)
    ys.append(b.y.kilometers)
    ps.append(b.pressure)
    obs, reward, done, info = env.step(action)
    if done:
      break
    action = agent.step(reward, obs)
  return (np.asarray(actions), np.asarray(xs), np.asarray(ys),
          np.asarray(ps), np.stack(obs_log))


def run_my_episode(seed, env_params, field_fn, max_steps=960):
  """Closed-loop ble_tpu episode from the parity_reset world."""
  from ble_tpu.env import wind_gp as wind_gp_lib
  state, obs = parity_reset_lib.parity_reset(seed, env_params,
                                             field_fn=field_fn)
  step = jax.jit(lambda s, a: my_env.step(env_params, s, a))
  refresh = jax.jit(lambda g: wind_gp_lib.refresh(g))
  actions, xs, ys, ps, obs_log = [], [], [], [], []
  for t in range(max_steps):
    if t and t % wind_gp_lib.REFRESH_PERIOD == 0:
      state = state.replace(gp=refresh(state.gp))
    a = int(my_ss.pick_action(obs))
    obs_log.append(np.asarray(obs, np.float32))
    actions.append(a)
    xs.append(float(state.balloon.x_m) / 1000.0)
    ys.append(float(state.balloon.y_m) / 1000.0)
    ps.append(float(state.balloon.pressure_pa))
    out = step(state, a)
    state, obs = out.state, out.observation
    if bool(out.done):
      break
  return (np.asarray(actions), np.asarray(xs), np.asarray(ys),
          np.asarray(ps), np.stack(obs_log))


def analyze_seed(seed, decoder_params, env_params, field_fn):
  ra, rx, ry, rp, robs = run_reference_episode(seed, decoder_params)
  ma, mx, my_, mp, mobs = run_my_episode(seed, env_params, field_fn)
  n = min(len(ra), len(ma))
  diff = np.nonzero(ra[:n] != ma[:n])[0]
  rec = {'seed': int(seed), 'ref_steps': int(len(ra)),
         'ble_tpu_steps': int(len(ma))}
  if len(diff) == 0:
    rec['first_divergence_step'] = None
    rec['identical_actions'] = True
    return rec
  t = int(diff[0])
  rec['identical_actions'] = False
  rec['first_divergence_step'] = t
  rec['pre_flip_pos_delta_km'] = float(
      np.hypot(rx[t] - mx[t], ry[t] - my_[t])) if t < len(rx) else None
  rec['pre_flip_pressure_delta_pa'] = float(abs(rp[t] - mp[t]))
  rec['ref_action'] = int(ra[t])
  rec['ble_tpu_action'] = int(ma[t])

  # Knife-edge margin: on the REFERENCE observation at the flip step,
  # the altitude-score gap between the level its own agent picked and
  # the best level in the direction ble_tpu picked. StationSeeker picks
  # argmax score then moves toward it; a flip means the top-2 levels
  # straddle the current one, and their score gap is the decision margin.
  s = np.asarray(my_ss.scores(jnp.asarray(robs[t])))
  order = np.argsort(-s)
  rec['ref_obs_top2_score_gap'] = float(s[order[0]] - s[order[1]])
  rec['ref_obs_top_score'] = float(s[order[0]])
  s2 = np.asarray(my_ss.scores(jnp.asarray(mobs[t])))
  rec['max_score_delta_between_runtimes'] = float(
      np.max(np.abs(s - s2)))
  rec['max_obs_delta_at_flip'] = float(np.max(np.abs(robs[t] - mobs[t])))
  return rec


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('--report', default='results/parity_report.json')
  p.add_argument('--out', default='results/parity_divergence.json')
  p.add_argument('--max_seeds', type=int, default=0)
  args = p.parse_args()

  with open(args.report) as f:
    report = json.load(f)
  pairs = report['e2e_paired_station_seeker']['pairs']
  divergent = [p_['seed'] for p_ in pairs
               if abs(p_['ble_tpu_twr'] - p_['ref_twr']) > 1e-7]
  if args.max_seeds:
    divergent = divergent[:args.max_seeds]
  print(f'{len(divergent)} divergent seeds: {divergent}', flush=True)

  decoder_params = loader.load_offlineskies22()
  env_params = my_env.EnvParams()
  from ble_tpu.generative import vae as my_vae
  field_fn = lambda key: my_vae.sample_field(decoder_params, key)

  records = []
  for seed in divergent:
    t0 = time.time()
    rec = analyze_seed(seed, decoder_params, env_params, field_fn)
    rec['wall_s'] = round(time.time() - t0, 1)
    records.append(rec)
    print(rec, flush=True)

  flips = [r for r in records if r.get('first_divergence_step') is not None]
  summary = {
      'num_divergent_seeds': len(records),
      'num_with_action_flip': len(flips),
      'median_first_divergence_step': (
          float(np.median([r['first_divergence_step'] for r in flips]))
          if flips else None),
      'max_pre_flip_pos_delta_km': (
          max(r['pre_flip_pos_delta_km'] for r in flips) if flips else None),
      'max_score_delta_between_runtimes': (
          max(r['max_score_delta_between_runtimes'] for r in flips)
          if flips else None),
      'records': records,
  }
  with open(args.out, 'w') as f:
    json.dump(summary, f, indent=1)
  print(json.dumps({k: v for k, v in summary.items() if k != 'records'},
                   indent=1), flush=True)


if __name__ == '__main__':
  main()
