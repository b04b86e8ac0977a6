"""QR-DQN learning-curve run (BASELINE config 4 validation).

Trains the vectorized QR-DQN actor-learner and periodically evaluates the
greedy policy on a fixed seed suite, writing a JSONL learning curve:

  {"iteration": N, "env_steps": ..., "grad_steps": ..., "wall_s": ...,
   "eval_mean_twr": ..., "eval_mean_reward": ..., "train_mean_reward": ...}

This is the rebuild's counterpart of the reference's training-curve figure
(docs/benchmarks.rst: eval TWR on small_eval during training, with the
StationSeeker horizontal reference line). The StationSeeker baseline on the
same suite is computed once and recorded in the first line.

Example:
  python -m examples.train_learning_curve --out /tmp/curve \
      --num_envs 256 --iterations 200 --eval_every 5 --eval_seeds 64
"""

import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ble_tpu.agents import qrdqn as qrdqn_lib
from ble_tpu.agents import replay as replay_lib
from ble_tpu.agents import station_seeker
from ble_tpu.env import env as env_lib
from ble_tpu.train import eval_lib
from ble_tpu.train import learner as learner_lib
from ble_tpu.train import train_lib


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('--out', type=str, required=True)
  p.add_argument('--num_envs', type=int, default=256)
  p.add_argument('--iterations', type=int, default=200,
                 help='One iteration = one lockstep batch of episodes.')
  p.add_argument('--episode_length', type=int, default=960)
  p.add_argument('--chunk_steps', type=int, default=96)
  p.add_argument('--eval_every', type=int, default=5)
  p.add_argument('--ckpt_every', type=int, default=25,
                 help='Checkpoint period in iterations (a checkpoint '
                 'downloads the full TrainState incl. the replay ring '
                 'from the device, so keep this sparse).')
  p.add_argument('--eval_seeds', type=int, default=64,
                 help='Seeds 0..N-1 (a small_eval-style fixed suite).')
  p.add_argument('--eval_max_steps', type=int, default=960)
  p.add_argument('--learning_rate', type=float, default=2e-6)
  p.add_argument('--samples_per_insert', type=float, default=8.0)
  p.add_argument('--prioritized', action='store_true')
  p.add_argument('--wind_field', type=str, default='generative',
                 choices=['generative', 'static'])
  p.add_argument('--seed', type=int, default=0)
  p.add_argument('--max_hours', type=float, default=0.0,
                 help='Stop after this many wall-clock hours (0 = no cap).')
  p.add_argument('--agent', type=str, default='quantile')
  p.add_argument('--donate', action='store_true',
                 help='Donate the TrainState through the chunk/reset jits '
                 '(halves peak HBM; unsupported over the remote-TPU '
                 'tunnel).')
  p.add_argument('--set', action='append', default=[],
                 help='TrainConfig override, e.g. replay.batch_size=512')
  p.add_argument('--light_ckpt', action='store_true',
                 help='Checkpoint only the learner state (~50 MB) '
                 'instead of the full TrainState (multi-GB replay '
                 'ring; ~28 min/download through the remote-TPU '
                 'tunnel). Resume re-warms the replay.')
  p.add_argument('--no_field_cache', action='store_true',
                 help='Disable the windowed field-slab cache '
                 '(EnvParams.field_cache, on by default: 4x4 lat/lng '
                 'window per step, bit-exact below ~34.7 m/s sustained '
                 'wind).')
  args = p.parse_args()

  os.makedirs(args.out, exist_ok=True)
  curve_path = os.path.join(args.out, 'curve.jsonl')

  env_params = env_lib.EnvParams(field_cache=not args.no_field_cache)
  if args.wind_field == 'generative':
    from ble_tpu.models import loader
    decoder_params = loader.load_offlineskies22()
    field_fn = env_lib.make_field_fn('generative', decoder_params)
  else:
    field_fn = env_lib.make_field_fn('static')

  from ble_tpu import config as config_lib
  config = learner_lib.TrainConfig(
      agent=args.agent,
      num_envs=args.num_envs,
      episode_length=args.episode_length,
      samples_per_insert=args.samples_per_insert,
      qrdqn=qrdqn_lib.QrDqnConfig(learning_rate=args.learning_rate),
      replay=replay_lib.ReplayConfig(prioritized=args.prioritized))
  config = config_lib.apply_overrides(config, args.set)
  core = learner_lib.make_agent_core(config)

  eval_seeds = jnp.arange(args.eval_seeds, dtype=jnp.int32)

  # StationSeeker reference line on the same suite (computed once; restarts
  # of a resumable run skip it).
  have_baseline = (os.path.exists(curve_path) and
                   '"baseline"' in open(curve_path).read())
  if not have_baseline:
    ss_eval = eval_lib.build_eval_fn(
        env_params, field_fn, lambda key: (),
        lambda state, obs, key: (state, station_seeker.pick_action(obs)),
        max_steps=args.eval_max_steps)
    t0 = time.perf_counter()
    ss = jax.tree.map(np.asarray, ss_eval(eval_seeds))
    baseline = {
        'station_seeker_mean_twr': float(ss['time_within_radius'].mean()),
        'station_seeker_mean_reward': float(ss['cumulative_reward'].mean()),
        'eval_wall_s': round(time.perf_counter() - t0, 1),
        'num_eval_seeds': args.eval_seeds,
    }
    with open(curve_path, 'a') as f:
      f.write(json.dumps({'baseline': baseline}) + '\n')
    print('baseline:', baseline, flush=True)

  ts = learner_lib.init_train_state(jax.random.PRNGKey(args.seed), env_params,
                                    field_fn, config)
  start_iteration = 0
  ts, latest = train_lib.restore_latest_checkpoint(args.out, ts)
  start_iteration = latest + 1

  # Donating the TrainState halves peak HBM (it embeds the replay ring --
  # num_envs x ring_len x 1099 obs floats, multiple GB -- and without
  # donation jit keeps input AND output copies live: observed OOM at 2048
  # envs on a 16 GB chip). Opt-in: the remote-TPU tunnel used in this
  # container rejects donated-buffer programs (INVALID_ARGUMENT on the
  # next output fetch); on directly-attached TPUs pass --donate.
  donate = (0,) if args.donate else ()
  chunk_fns = {}
  def get_chunk(n):
    if n not in chunk_fns:
      chunk_fns[n] = jax.jit(
          functools.partial(learner_lib.run_episode_chunk, config,
                            env_params, num_steps=n),
          donate_argnums=donate)
    return chunk_fns[n]

  decode_fields = jax.jit(jax.vmap(field_fn))
  reset_fn = jax.jit(functools.partial(
      learner_lib.selective_reset, env_params=env_params, config=config),
      donate_argnums=donate)
  field_key = jax.random.PRNGKey(args.seed ^ 0x0F1E2D3C)

  if core.actor_select is not None:  # Recurrent (r2d2).
    greedy_fn = eval_lib.build_parametric_eval_fn(
        env_params, field_fn,
        policy_init=lambda params, key: core.actor_init(()),
        policy_step=lambda params, state, obs, key: core.actor_select(
            params, state, obs, None, 0.0),
        max_steps=args.eval_max_steps)
  else:
    greedy_fn = eval_lib.build_parametric_eval_fn(
        env_params, field_fn,
        policy_init=lambda params, key: (),
        policy_step=lambda params, state, obs, key: (
            state, core.select_action(params, obs, None, 0.0)),
        max_steps=args.eval_max_steps)

  def greedy_eval(params):
    return jax.tree.map(np.asarray, greedy_fn(params, eval_seeds))

  run_start = time.perf_counter()
  for iteration in range(start_iteration, args.iterations):
    it_start = time.perf_counter()
    rewards = []
    losses = []
    completed_returns = []
    steps_done = 0
    while steps_done < args.episode_length:
      # Per-env auto-reset: terminal/truncated envs restart from fresh
      # batch-decoded fields at every chunk boundary.
      field_key, sub = jax.random.split(field_key)
      fields = decode_fields(jax.random.split(sub, args.num_envs))
      ts, reset_stats = reset_fn(ts, fields=fields)
      done_mask = np.asarray(reset_stats['completed'])
      if done_mask.any():
        completed_returns.extend(
            np.asarray(reset_stats['returns'])[done_mask].tolist())
      n = min(args.chunk_steps, args.episode_length - steps_done)
      ts, metrics = get_chunk(n)(ts)
      rewards.append(np.asarray(metrics['reward']))
      losses.append(np.asarray(metrics['loss']))
      steps_done += n
    train_reward = float(np.concatenate(rewards).mean())
    train_loss = float(np.concatenate(losses).mean())

    record = {
        'iteration': iteration,
        'env_steps': int(ts.env_steps) * args.num_envs,
        'grad_steps': int(np.asarray(
            getattr(ts.learner, 'train_steps', 0))),
        'episodes_done': int(ts.episodes_done),
        'train_mean_reward': train_reward,
        'train_mean_loss': train_loss,
        'mean_episode_return': (float(np.mean(completed_returns))
                                if completed_returns else None),
        'iter_wall_s': round(time.perf_counter() - it_start, 1),
        'total_wall_s': round(time.perf_counter() - run_start, 1),
    }
    if iteration % args.eval_every == 0 or iteration == args.iterations - 1:
      ev = greedy_eval(core.params_of(ts.learner))
      record['eval_mean_twr'] = float(ev['time_within_radius'].mean())
      record['eval_mean_reward'] = float(ev['cumulative_reward'].mean())
    if iteration % args.ckpt_every == 0 or iteration == args.iterations - 1:
      train_lib.save_checkpoint(args.out, ts, iteration,
                                light=args.light_ckpt)
    with open(curve_path, 'a') as f:
      f.write(json.dumps(record) + '\n')
    print(record, flush=True)
    if args.max_hours and (time.perf_counter() - run_start) > args.max_hours * 3600:
      train_lib.save_checkpoint(args.out, ts, iteration,
                                light=args.light_ckpt)
      print('hit max_hours, stopping', flush=True)
      break


if __name__ == '__main__':
  main()
