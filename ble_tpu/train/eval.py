"""Evaluation CLI (reference eval/eval.py).

Example:
  python -m ble_tpu.train.eval --agent station_seeker --suite small_eval \\
      --wind_field generative --output_dir /tmp/ble_eval
Sharding across machines mirrors the reference's --num_shards/--shard_idx
seed slicing (eval/eval.py:125-128); on one machine the whole suite is a
single vectorized batch.
"""

import argparse
import os

import jax

from ble_tpu.env import env as env_lib
from ble_tpu.train import eval_lib
from ble_tpu.train import suites


def make_policy_fns(agent_name: str, checkpoint_dir=None):
  """Returns (policy_init, policy_step) for the vectorized evaluator."""
  if agent_name == 'station_seeker':
    from ble_tpu.agents import station_seeker
    return (lambda key: (),
            lambda state, obs, key: (state, station_seeker.pick_action(obs)))
  if agent_name == 'random':
    return (lambda key: (),
            lambda state, obs, key: (state, jax.random.randint(key, (), 0, 3)))
  if agent_name == 'random_walk':
    from ble_tpu.agents import random_walk
    return (random_walk.init,
            lambda state, obs, key: random_walk.step(state, obs, key))
  if agent_name == 'perciatelli44':
    from ble_tpu.agents import perciatelli44
    from ble_tpu.models import loader
    policy = perciatelli44.make_policy(loader.load_perciatelli44())
    return (lambda key: (),
            lambda state, obs, key: (state, policy(obs)))
  if agent_name in ('quantile', 'finetune_perciatelli', 'dqn', 'mlp',
                    'r2d2'):
    from ble_tpu.train import learner as learner_lib
    from ble_tpu.train import train_lib
    # config carries the network architecture for the requested agent;
    # params come out of the checkpoint template-free (no TrainState
    # reconstruction, so the training-time replay/env shapes don't
    # matter here).
    config = learner_lib.TrainConfig(agent=agent_name)
    if checkpoint_dir is None:
      raise ValueError(f'{agent_name} needs --checkpoint_dir')
    params, _ = train_lib.restore_latest_learner_params(checkpoint_dir)
    return learner_lib.make_eval_policy(config, params)
  raise ValueError(f'Unknown agent: {agent_name}')


def main():
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--agent', type=str, default='station_seeker')
  parser.add_argument('--suite', type=str, default='micro_eval',
                      choices=suites.available_suites())
  parser.add_argument('--wind_field', type=str, default='generative',
                      choices=['generative', 'static'])
  parser.add_argument('--output_dir', type=str, default='/tmp/ble_eval')
  parser.add_argument('--checkpoint_dir', type=str, default=None)
  parser.add_argument('--batch_size', type=int, default=256,
                      help='Seeds evaluated per device batch.')
  parser.add_argument('--num_shards', type=int, default=1)
  parser.add_argument('--shard_idx', type=int, default=0)
  parser.add_argument('--flight_path', action='store_true')
  parser.add_argument('--f32_grid', action='store_true',
                      help='Store forecast grids in f32 instead of the '
                      'bf16 training default (parity/eval mode; use when '
                      'evaluating externally-trained policies -- see '
                      'docs/benchmarks.md "bf16 grid cost").')
  parser.add_argument('--no_field_cache', action='store_true',
                      help='Disable the windowed field-slab cache '
                      '(EnvParams.field_cache; on by default).')
  args = parser.parse_args()

  suite = suites.get_eval_suite(args.suite)
  seeds = suite.seeds[args.shard_idx::args.num_shards]

  env_params = env_lib.EnvParams(wind_field_f32=args.f32_grid,
                                 field_cache=not args.no_field_cache)
  if args.wind_field == 'generative':
    from ble_tpu.models import loader
    field_fn = env_lib.make_field_fn('generative', loader.load_offlineskies22())
  else:
    field_fn = env_lib.make_field_fn('static')

  policy_init, policy_step = make_policy_fns(args.agent, args.checkpoint_dir)
  eval_fn = eval_lib.build_eval_fn(
      env_params, field_fn, policy_init, policy_step,
      max_steps=suite.max_episode_length,
      record_flight_path=args.flight_path)
  results = eval_lib.evaluate(eval_fn, seeds,
                              batch_size=min(args.batch_size, len(seeds)))

  os.makedirs(args.output_dir, exist_ok=True)
  shard_suffix = (f'_{args.shard_idx}' if args.num_shards > 1 else '')
  out_path = os.path.join(args.output_dir,
                          f'{args.agent}_{args.suite}{shard_suffix}.json')
  eval_lib.write_results_json(results, out_path, args.agent, args.suite)
  print(eval_lib.summarize(results))
  print(f'Wrote {out_path}')


if __name__ == '__main__':
  main()
