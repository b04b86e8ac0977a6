"""Training harness: iteration loop, collectors, orbax checkpoint/resume.

Counterpart of the reference ``train_lib.py:40-131`` (episode loop with
per-iteration checkpointing and resume-from-latest), adapted to the
vectorized actor-learner: an "episode" is a lockstep batch of
`config.num_envs` episodes, scanned on device in chunks, with host-side
collector dispatch between chunks. Checkpoints are orbax pytree saves of
the full `TrainState` (params, optimizer, replay, counters), replacing the
reference's pickle bundles (agents/dopamine_utils.py:50-122).
"""

import functools
import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from ble_tpu.env import env as env_lib
from ble_tpu.metrics import collectors as collectors_lib
from ble_tpu.train import learner as learner_lib


def _checkpoint_manager(base_dir: str, max_to_keep: int = 5):
  directory = os.path.join(os.path.abspath(base_dir), 'checkpoints')
  os.makedirs(directory, exist_ok=True)
  options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                         create=True)
  return ocp.CheckpointManager(directory, options=options)


def save_checkpoint(base_dir: str, ts: learner_lib.TrainState,
                    iteration: int, max_to_keep: int = 5) -> None:
  mgr = _checkpoint_manager(base_dir, max_to_keep)
  mgr.save(iteration, args=ocp.args.StandardSave(ts))
  mgr.wait_until_finished()
  mgr.close()


def restore_latest_checkpoint(base_dir: str,
                              template: learner_lib.TrainState):
  """Returns (train_state, iteration) or (template, -1) if none exists."""
  directory = os.path.join(os.path.abspath(base_dir), 'checkpoints')
  if not os.path.isdir(directory):
    return template, -1
  mgr = _checkpoint_manager(base_dir)
  latest = mgr.latest_step()
  if latest is None:
    mgr.close()
    return template, -1
  restored = mgr.restore(
      latest, args=ocp.args.StandardRestore(jax.tree.map(
          ocp.utils.to_shape_dtype_struct, template)))
  mgr.close()
  return restored, latest


def run_training_loop(base_dir: Optional[str],
                      env_params: env_lib.EnvParams,
                      field_fn: Callable,
                      config: learner_lib.TrainConfig,
                      num_iterations: int,
                      episodes_per_iteration: int = 1,
                      episode_length: Optional[int] = None,
                      chunk_steps: int = 96,
                      collectors: Sequence[str] = ('console',),
                      seed: int = 0,
                      checkpoint: bool = True) -> learner_lib.TrainState:
  """Runs the vectorized training loop (reference train_lib.py:81-131).

  One reference "episode" maps to `config.num_envs` parallel episodes.
  """
  episode_length = episode_length or config.episode_length
  dispatcher = collectors_lib.CollectorDispatcher(
      base_dir, env_lib.NUM_ACTIONS, collectors)
  dispatcher.pre_training()

  ts = learner_lib.init_train_state(jax.random.PRNGKey(seed), env_params,
                                    field_fn, config)
  start_iteration = 0
  if checkpoint and base_dir is not None:
    ts, latest = restore_latest_checkpoint(base_dir, ts)
    start_iteration = latest + 1

  chunk = jax.jit(functools.partial(learner_lib.run_episode_chunk, config,
                                    env_params, num_steps=chunk_steps))
  reset_ep = jax.jit(functools.partial(learner_lib.reset_episode,
                                       env_params=env_params,
                                       field_fn=field_fn, config=config))

  for iteration in range(start_iteration, num_iterations):
    for _ in range(episodes_per_iteration):
      ts = reset_ep(ts)
      dispatcher.begin_episode()
      steps_done = 0
      last_stats = None
      while steps_done < episode_length:
        n = min(chunk_steps, episode_length - steps_done)
        if n != chunk_steps:
          partial_chunk = jax.jit(functools.partial(
              learner_lib.run_episode_chunk, config, env_params,
              num_steps=n))
          ts, metrics = partial_chunk(ts)
        else:
          ts, metrics = chunk(ts)
        metrics = jax.tree.map(np.asarray, metrics)
        for i in range(n - 1):
          last_stats = collectors_lib.StatisticsInstance(
              step=steps_done + i, action=np.zeros(()),
              reward=metrics['reward'][i],
              terminal=np.zeros((), bool))
          dispatcher.step(last_stats)
        steps_done += n
      dispatcher.end_episode(collectors_lib.StatisticsInstance(
          step=steps_done, action=np.zeros(()),
          reward=metrics['reward'][-1], terminal=np.ones((), bool)))
    if checkpoint and base_dir is not None:
      save_checkpoint(base_dir, ts, iteration)
  dispatcher.end_training()
  return ts
