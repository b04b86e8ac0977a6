"""Training CLI (reference train.py).

Example:
  python -m ble_tpu.train.train --base_dir /tmp/ble_run \\
      --num_iterations 200 --episodes_per_iteration 1 \\
      --set num_envs=1024 --set qrdqn.learning_rate=2e-6
"""

import argparse

import jax

from ble_tpu import config as config_lib
from ble_tpu.env import env as env_lib
from ble_tpu.train import learner as learner_lib
from ble_tpu.train import train_lib


def main():
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--base_dir', type=str, default=None,
                      help='Directory for checkpoints/metrics.')
  parser.add_argument('--num_iterations', type=int, default=200)
  parser.add_argument('--episodes_per_iteration', type=int, default=1)
  parser.add_argument('--max_episode_length', type=int, default=960)
  parser.add_argument('--wind_field', type=str, default='generative',
                      choices=['generative', 'static'])
  parser.add_argument('--collectors', type=str, default='console',
                      help='Comma-separated: console,pickle,tensorboard')
  parser.add_argument('--seed', type=int, default=0)
  parser.add_argument('--set', action='append', default=[],
                      help='TrainConfig override, e.g. num_envs=512')
  args = parser.parse_args()

  config = learner_lib.TrainConfig()
  config = config_lib.apply_overrides(config, args.set)

  env_params = env_lib.EnvParams()
  if args.wind_field == 'generative':
    from ble_tpu.generative import vae
    from ble_tpu.models import loader
    decoder_params = loader.load_offlineskies22()
    field_fn = env_lib.make_field_fn('generative', decoder_params)
  else:
    field_fn = env_lib.make_field_fn('static')

  train_lib.run_training_loop(
      base_dir=args.base_dir,
      env_params=env_params,
      field_fn=field_fn,
      config=config,
      num_iterations=args.num_iterations,
      episodes_per_iteration=args.episodes_per_iteration,
      episode_length=args.max_episode_length,
      collectors=[c for c in args.collectors.split(',') if c],
      seed=args.seed)


if __name__ == '__main__':
  main()
