"""Distributed QR-DQN training CLI.

Counterpart of the reference ``distributed_train_acme_qrdqn.py`` (128
Launchpad actor processes + Reverb + learner): here the same experiment is
ONE program over a device mesh -- envs and replay sharded along the mesh
`env` axis, learner replicated, gradients all-reduced over ICI (see
ble_tpu/parallel/distributed.py). On a multi-host slice, run the same
command on every host after `jax.distributed.initialize()` (pass
--multihost).

Example (single host, all local devices):
  python -m ble_tpu.train.distributed_train --num_env_steps 5000 \\
      --set num_envs=1024
"""

import argparse
import time

import jax


def main():
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--base_dir', type=str, default=None)
  parser.add_argument('--num_env_steps', type=int, default=960 * 10)
  parser.add_argument('--chunk_steps', type=int, default=96)
  parser.add_argument('--episode_length', type=int, default=960)
  parser.add_argument('--wind_field', type=str, default='generative',
                      choices=['generative', 'static'])
  parser.add_argument('--n_devices', type=int, default=None)
  parser.add_argument('--multihost', action='store_true',
                      help='Call jax.distributed.initialize() first.')
  parser.add_argument('--coordinator_address', type=str, default=None,
                      help='host:port of process 0 (multihost). Omit on '
                      'clusters jax auto-detects (SLURM/TPU pods).')
  parser.add_argument('--num_processes', type=int, default=None)
  parser.add_argument('--process_id', type=int, default=None)
  parser.add_argument('--seed', type=int, default=0)
  parser.add_argument('--set', action='append', default=[])
  parser.add_argument('--no_field_cache', action='store_true',
                      help='Disable the windowed field-slab cache '
                      '(EnvParams.field_cache; on by default).')
  args = parser.parse_args()

  if args.multihost:
    # Must run before ANY XLA-backend-initializing call -- including the
    # ble_tpu imports below, whose module-level jnp constant tables touch
    # the backend. Topology comes from the flags, or from cluster
    # auto-detection when they are omitted (tests/test_two_host_dcn.py
    # runs this two-process on CPU).
    jax.distributed.initialize(
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes,
        process_id=args.process_id)

  # Deferred so `--multihost` initializes first (see above).
  import numpy as np
  from ble_tpu import config as config_lib
  from ble_tpu.env import env as env_lib
  from ble_tpu.parallel import distributed
  from ble_tpu.train import learner as learner_lib
  from ble_tpu.train import train_lib

  config = learner_lib.TrainConfig()
  config = config_lib.apply_overrides(config, args.set)

  env_params = env_lib.EnvParams(field_cache=not args.no_field_cache)
  if args.wind_field == 'generative':
    from ble_tpu.models import loader
    field_fn = env_lib.make_field_fn('generative',
                                     loader.load_offlineskies22())
  else:
    field_fn = env_lib.make_field_fn('static')

  mesh = distributed.make_mesh(args.n_devices)
  print(f'Mesh: {mesh.devices.size} devices, global envs: '
        f'{config.num_envs}, grad steps/env-step: '
        f'{config.grad_steps_per_env_step()}')

  ts = distributed.init_distributed_train_state(
      jax.random.PRNGKey(args.seed), mesh, config, env_params, field_fn)
  step = distributed.build_distributed_step(mesh, config, env_params,
                                            num_steps=args.chunk_steps)
  reset_fn = distributed.build_distributed_reset(mesh, config, env_params)
  from jax.sharding import NamedSharding, PartitionSpec as P
  decode_fields = jax.jit(
      jax.vmap(field_fn),
      out_shardings=NamedSharding(mesh, P(distributed.ENV_AXIS)))
  field_key = jax.random.PRNGKey(args.seed ^ 0x0F1E2D3C)

  steps_done = 0
  t_start = time.perf_counter()
  while steps_done < args.num_env_steps:
    field_key, sub = jax.random.split(field_key)
    ts, _ = reset_fn(ts, decode_fields(jax.random.split(sub,
                                                        config.num_envs)))
    ts, metrics = step(ts)
    steps_done += args.chunk_steps
    reward = float(np.asarray(metrics['reward']).mean())
    loss = float(np.asarray(metrics['loss']).mean())
    rate = steps_done * config.num_envs / (time.perf_counter() - t_start)
    print(f'env_steps={steps_done} mean_reward={reward:.4f} '
          f'loss={loss:.5f} env-steps/s={rate:,.0f}')
    if args.base_dir:
      train_lib.save_checkpoint(args.base_dir, ts,
                                steps_done // args.chunk_steps)


if __name__ == '__main__':
  main()
