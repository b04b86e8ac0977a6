"""Two-process DCN topology dryrun (SURVEY.md section 5.8).

Spawns TWO OS processes, each a separate `jax.distributed` participant
with 4 virtual CPU devices, and runs the REAL distributed training CLI
(`ble_tpu.train.distributed_train --multihost`) across the resulting
2-host x 4-device global mesh: distributed init, global mesh build,
sharded env reset + chunk step, cross-host gradient pmean, and metric
fetch. This covers the multihost code path that single-process tests
cannot (the reference's Launchpad/Vertex path is untested upstream;
SURVEY.md section 4).

Marked slow: two cold JAX processes compiling the training chunk on CPU.
"""

import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
  s = socket.socket()
  s.bind(('127.0.0.1', 0))
  port = s.getsockname()[1]
  s.close()
  return port


@pytest.mark.slow
def test_two_process_dcn_training_step(tmp_path):
  port = _free_port()
  procs = []
  logs = []
  for pid in range(2):
    env = dict(os.environ)
    env.pop('PYTHONPATH', None)  # Drop the TPU-plugin sitecustomize.
    env.update({
        'JAX_PLATFORMS': 'cpu',
        'XLA_FLAGS': '--xla_force_host_platform_device_count=4',
        # Distinct compilation caches: both processes compile the same
        # programs concurrently; sharing one cache dir races.
        'JAX_COMPILATION_CACHE_DIR': str(tmp_path / f'cache{pid}'),
        'PYTHONUNBUFFERED': '1',
    })
    log = open(tmp_path / f'proc{pid}.log', 'w')
    logs.append(log)
    procs.append(subprocess.Popen(
        [sys.executable, '-m', 'ble_tpu.train.distributed_train',
         '--multihost', '--coordinator_address', f'127.0.0.1:{port}',
         '--num_processes', '2', '--process_id', str(pid),
         '--num_env_steps', '192', '--chunk_steps', '96',
         '--episode_length', '96', '--wind_field', 'static',
         '--set', 'num_envs=32',
         '--set', 'replay.ring_len=64',
         '--set', 'replay.batch_size=8',
         '--set', 'samples_per_insert=2.0',
         '--set', 'qrdqn.hidden_units=32',
         '--set', 'qrdqn.num_layers=2',
         '--set', 'qrdqn.min_replay_history=8'],
        cwd=_REPO, env=env, stdout=log, stderr=subprocess.STDOUT))

  try:
    for p in procs:
      p.wait(timeout=900)
  finally:
    for p in procs:
      if p.poll() is None:
        p.kill()
    for log in logs:
      log.close()

  outputs = [(tmp_path / f'proc{i}.log').read_text() for i in range(2)]
  for i, (p, out) in enumerate(zip(procs, outputs)):
    assert p.returncode == 0, f'process {i} failed:\n{out[-3000:]}'
    assert 'Mesh: 8 devices' in out, out[-2000:]
    assert 'env_steps=192' in out, out[-2000:]
