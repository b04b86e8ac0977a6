"""Weak-scaling measurement of the distributed train step on a virtual mesh.

VERDICT r4 next-8: the 8-device CPU dryrun proves the sharded path is
correct; this tool puts a NUMBER behind the scaling claim. For each mesh
size n in {1, 2, 4, 8} it launches a fresh interpreter with
`--xla_force_host_platform_device_count=n`, builds the production
data-parallel trainer (ble_tpu/parallel/distributed.py: env batch and
replay sharded along the env axis, learner replicated with pmean'd
grads), runs the scanned train step at a FIXED per-device env count
(weak scaling), and records env-steps/s and grad-steps/s.

CPU-mesh numbers are directional only -- virtual devices share one
host's cores, so perfect scaling is NOT expected even when the program
scales; what the table shows is that per-device work stays constant and
the collective volume (one pmean of an 8x600 MLP grad per learner step)
does not grow with the mesh.

Usage:
  PYTHONPATH= python tools/weak_scaling.py            # full table
  PYTHONPATH= python tools/weak_scaling.py --n 4      # one point (internal)
"""

import argparse
import json
import os
import subprocess
import sys
import time

ENVS_PER_DEVICE = 32
CHUNK_STEPS = 32
ROUNDS = 3


def measure(n: int) -> dict:
  import jax
  import jax.numpy as jnp

  from ble_tpu.agents import qrdqn
  from ble_tpu.agents import replay as replay_lib
  from ble_tpu.env import env as env_lib
  from ble_tpu.parallel import distributed
  from ble_tpu.train import learner as learner_lib

  assert len(jax.devices()) == n, (len(jax.devices()), n)
  mesh = distributed.make_mesh(n)
  config = learner_lib.TrainConfig(
      num_envs=ENVS_PER_DEVICE * n,
      samples_per_insert=8.0,
      qrdqn=qrdqn.QrDqnConfig(min_replay_history=32),
      replay=replay_lib.ReplayConfig(ring_len=1024, batch_size=32,
                                     prioritized=True))
  env_params = env_lib.EnvParams()
  field_fn = env_lib.make_field_fn('static')

  ts = distributed.init_distributed_train_state(
      jax.random.PRNGKey(0), mesh, config, env_params, field_fn)
  step = distributed.build_distributed_step(mesh, config, env_params,
                                            num_steps=CHUNK_STEPS)
  ts, metrics = step(ts)  # Warmup/compile.
  jax.block_until_ready(ts)

  times = []
  for _ in range(ROUNDS):
    t0 = time.perf_counter()
    ts, metrics = step(ts)
    jax.block_until_ready(ts)
    times.append(time.perf_counter() - t0)
  dt = min(times)
  grad_per_chunk = CHUNK_STEPS * config.num_envs * (
      1.0 / config.samples_per_insert) / config.replay.batch_size
  return {
      'devices': n,
      'num_envs': config.num_envs,
      'envs_per_device': ENVS_PER_DEVICE,
      'chunk_steps': CHUNK_STEPS,
      'env_steps_per_s': CHUNK_STEPS * config.num_envs / dt,
      'grad_steps_per_s': grad_per_chunk / dt,
      'chunk_wall_s': dt,
  }


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--n', type=int, default=0)
  p.add_argument('--out', default='results/weak_scaling.json')
  args = p.parse_args()

  if args.n:
    print(json.dumps(measure(args.n)))
    return

  rows = []
  for n in (1, 2, 4, 8):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '') +
                        f' --xla_force_host_platform_device_count={n}')
    # Repo root only: keeps ble_tpu importable from the tools/ script dir
    # while dropping the axon sitecustomize path (TPU plugin) from child
    # interpreters.
    env['PYTHONPATH'] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), '--n', str(n)],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if out.returncode:
      print(out.stdout, out.stderr)
      raise SystemExit(f'n={n} failed')
    row = json.loads(out.stdout.strip().splitlines()[-1])
    rows.append(row)
    base = rows[0]['env_steps_per_s'] / rows[0]['devices']
    print(f"devices={n}: {row['env_steps_per_s']:.0f} env-steps/s "
          f"({row['env_steps_per_s'] / (base * n):.2f}x of linear), "
          f"{row['grad_steps_per_s']:.1f} grad-steps/s")
  payload = {'rows': rows, 'note': (
      'virtual CPU mesh (one host, devices share cores): directional '
      'only; weak scaling at %d envs/device' % ENVS_PER_DEVICE)}
  os.makedirs(os.path.dirname(args.out), exist_ok=True)
  with open(args.out, 'w') as f:
    json.dump(payload, f, indent=2)
  print('wrote', args.out)


if __name__ == '__main__':
  main()
