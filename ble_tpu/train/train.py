"""Training CLI (reference train.py:73-95, agent-generic via the registry).

Examples:
  python -m ble_tpu.train.train --base_dir /tmp/ble_run --agent quantile \\
      --num_iterations 200 --set num_envs=1024 --set qrdqn.learning_rate=2e-6
  python -m ble_tpu.train.train --agent dqn --num_iterations 10
  python -m ble_tpu.train.train --agent mlp --wind_field static
"""

import argparse
import json
import logging
import os
import time

import jax
import numpy as np

from ble_tpu import config as config_lib
from ble_tpu.env import env as env_lib
from ble_tpu.train import eval_lib
from ble_tpu.train import learner as learner_lib
from ble_tpu.train import suites
from ble_tpu.train import train_lib


def make_periodic_eval(base_dir, env_params, field_fn, config,
                       eval_suite: str, t_start: float):
  """Greedy-policy eval on a suite; appends one JSON line per call."""
  core = learner_lib.make_agent_core(config)
  if core.actor_select is not None:  # Recurrent (r2d2): thread the carry.
    eval_fn = eval_lib.build_parametric_eval_fn(
        env_params, field_fn,
        policy_init=lambda params, key: core.actor_init(()),
        policy_step=lambda params, state, obs, key: core.actor_select(
            params, state, obs, None, 0.0))
  else:
    eval_fn = eval_lib.build_parametric_eval_fn(
        env_params, field_fn,
        policy_init=lambda params, key: (),
        policy_step=lambda params, state, obs, key: (
            state, core.select_action(params, obs[None], None, 0.0)[0]))
  seeds = np.asarray(suites.get_eval_suite(eval_suite).seeds, np.int32)
  curve_path = os.path.join(base_dir, 'learning_curve.jsonl')

  def eval_cb(ts, iteration):
    results = eval_lib.evaluate(
        lambda s: eval_fn(core.params_of(ts.learner), s), seeds)
    summary = eval_lib.summarize(results)
    record = {
        'iteration': iteration,
        'env_steps': int(ts.env_steps) * config.num_envs,
        'train_steps': int(np.asarray(
            getattr(ts.learner, 'train_steps', 0))),
        'wall_s': time.time() - t_start,
        **summary,
    }
    with open(curve_path, 'a') as f:
      f.write(json.dumps(record) + '\n')
    logging.info('eval @ iter %d: TWR %.3f reward %.1f (%d seeds)',
                 iteration, summary['mean_twr'],
                 summary['mean_cumulative_reward'], summary['num_seeds'])

  return eval_cb


def main():
  logging.basicConfig(level=logging.INFO,
                      format='%(asctime)s %(levelname)s %(message)s')
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--base_dir', type=str, default=None,
                      help='Directory for checkpoints/metrics.')
  parser.add_argument('--agent', type=str, default='quantile',
                      choices=learner_lib.TRAINABLE_AGENTS)
  parser.add_argument('--num_iterations', type=int, default=200)
  parser.add_argument('--episodes_per_iteration', type=int, default=1)
  parser.add_argument('--max_episode_length', type=int, default=960)
  parser.add_argument('--wind_field', type=str, default='generative',
                      choices=['generative', 'static'])
  parser.add_argument('--collectors', type=str, default='console',
                      help='Comma-separated: console,pickle,tensorboard')
  parser.add_argument('--seed', type=int, default=0)
  parser.add_argument('--eval_every', type=int, default=0,
                      help='Eval cadence in iterations (0 = never).')
  parser.add_argument('--eval_suite', type=str, default='small_eval')
  parser.add_argument('--render_final', action='store_true',
                      help='Save the final iteration flight-path render '
                           '(reference train.py:95-109).')
  parser.add_argument('--max_hours', type=float, default=None,
                      help='Wall-clock budget; checkpoints and exits.')
  parser.add_argument('--set', action='append', default=[],
                      help='TrainConfig override, e.g. num_envs=512')
  parser.add_argument('--no_field_cache', action='store_true',
                      help='Disable the windowed field-slab cache '
                      '(EnvParams.field_cache; on by default).')
  args = parser.parse_args()

  config = learner_lib.TrainConfig(agent=args.agent)
  config = config_lib.apply_overrides(config, args.set)

  # Field-slab cache on by default in production training (bit-exact
  # below the documented wind bound; tests/test_wind_field_cache.py).
  env_params = env_lib.EnvParams(field_cache=not args.no_field_cache)
  if args.wind_field == 'generative':
    from ble_tpu.generative import vae
    from ble_tpu.models import loader
    decoder_params = loader.load_offlineskies22()
    field_fn = env_lib.make_field_fn('generative', decoder_params)
  else:
    field_fn = env_lib.make_field_fn('static')

  eval_cb = None
  if args.eval_every > 0 and args.base_dir:
    eval_cb = make_periodic_eval(args.base_dir, env_params, field_fn, config,
                                 args.eval_suite, time.time())

  train_lib.run_training_loop(
      base_dir=args.base_dir,
      env_params=env_params,
      field_fn=field_fn,
      config=config,
      num_iterations=args.num_iterations,
      episodes_per_iteration=args.episodes_per_iteration,
      episode_length=args.max_episode_length,
      collectors=[c for c in args.collectors.split(',') if c],
      seed=args.seed,
      eval_fn=eval_cb,
      eval_every=args.eval_every,
      render_final=args.render_final,
      max_seconds=None if args.max_hours is None else args.max_hours * 3600)


if __name__ == '__main__':
  main()
