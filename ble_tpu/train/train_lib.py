"""Training harness: iteration loop, collectors, orbax checkpoint/resume.

Counterpart of the reference ``train_lib.py:40-131`` (episode loop with
per-iteration checkpointing and resume-from-latest), adapted to the
vectorized actor-learner: envs run CONTINUOUSLY with per-env episode
boundaries -- terminal/960-step envs are selectively re-initialized at
chunk boundaries from batch-decoded wind fields (learner.selective_reset)
-- and one "iteration" is `episodes_per_iteration * episode_length`
lockstep steps. Collectors receive real per-step statistics streamed off
the device scan (action histograms, terminal counts, rewards), and the
final iteration's env-0 flight track is rendered like the reference's
end-of-training render (train.py:95-109). Checkpoints are orbax pytree
saves of the full `TrainState` (params, optimizer, replay, counters),
replacing the reference's pickle bundles (agents/dopamine_utils.py:50-122).
"""

import functools
import logging
import os
import time
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
                    iteration: int, max_to_keep: int = 5,
                    light: bool = False) -> None:
  """light=True saves ONLY the learner state (params/target/opt/steps):
  ~50 MB instead of the multi-GB full TrainState whose replay-ring
  download through the remote-TPU tunnel costs ~28 min at 1024 envs
  (STATUS round 3). A light checkpoint restores via
  restore_latest_learner_params / the eval CLIs; training resumed from
  it re-warms the replay ring instead of reloading it."""
  mgr = _checkpoint_manager(base_dir, max_to_keep)
  payload = {'learner': ts.learner} if light else ts
  mgr.save(iteration, args=ocp.args.StandardSave(payload))
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
  shapes = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
  try:
    restored = mgr.restore(latest, args=ocp.args.StandardRestore(shapes))
  except ValueError:
    # Checkpoints written by an older code version can have a different
    # pytree structure (e.g. optional replay extras added later). Read
    # the raw tree and graft its leaves onto the template BY PATH;
    # fields absent on disk keep the template's fresh initialization.
    restored = _merge_raw_checkpoint(template, mgr.restore(latest))
  mgr.close()
  return restored, latest


def _merge_raw_checkpoint(template, raw):
  """Grafts a raw (nested-dict) checkpoint onto a pytree template by
  matching key paths; unmatched template leaves stay as-is.

  Template leaves with NO matching checkpoint path are loudly reported:
  a silent partial graft can resume a half-restored network (e.g. a
  checkpoint written before a head was added trains fresh head layers on
  restored torso weights with no warning -- ADVICE r4)."""
  from jax import tree_util as jtu

  def name_of(k):
    for attr in ('name', 'key', 'idx'):
      if hasattr(k, attr):
        return str(getattr(k, attr))
    return str(k)

  raw_leaves = {
      tuple(name_of(k) for k in path): v
      for path, v in jtu.tree_flatten_with_path(raw)[0]
  }

  unmatched = []

  def build(path, leaf):
    v = raw_leaves.get(tuple(name_of(k) for k in path))
    if v is None:
      unmatched.append('/'.join(name_of(k) for k in path))
      return leaf
    return jnp.asarray(v)

  merged = jtu.tree_map_with_path(build, template)
  if unmatched:
    shown = ', '.join(unmatched[:8])
    more = f' (+{len(unmatched) - 8} more)' if len(unmatched) > 8 else ''
    logging.warning(
        'checkpoint graft: %d template leaves had no matching checkpoint '
        'path and keep their FRESH initialization: %s%s. If these are '
        'network weights (not replay/counters), the restored model is '
        'partially reinitialized -- check that the network config matches '
        'the checkpoint.', len(unmatched), shown, more)
  return merged


def restore_latest_learner_params(base_dir: str):
  """Returns (network_params, iteration) from the latest checkpoint.

  Template-free: reads the raw checkpoint pytree and extracts
  learner/params, so eval-time policies don't need to reconstruct a full
  TrainState (whose replay ring / env shapes depend on the training
  config; a mismatched StandardRestore template throws opaquely).
  Raises ValueError if no checkpoint exists.
  """
  directory = os.path.join(os.path.abspath(base_dir), 'checkpoints')
  mgr = _checkpoint_manager(base_dir) if os.path.isdir(directory) else None
  latest = mgr.latest_step() if mgr else None
  if latest is None:
    if mgr:
      mgr.close()
    raise ValueError(f'No checkpoint found in {base_dir}')
  raw = mgr.restore(latest)
  mgr.close()
  learner = raw['learner'] if isinstance(raw, dict) else raw.learner
  params = learner['params'] if isinstance(learner, dict) else learner.params
  return jax.tree.map(jnp.asarray, params), latest


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
                      checkpoint: bool = True,
                      eval_fn: Optional[Callable] = None,
                      eval_every: int = 0,
                      render_final: bool = False,
                      max_seconds: Optional[float] = None
                      ) -> learner_lib.TrainState:
  """Runs the vectorized training loop (reference train_lib.py:81-131).

  One reference "episode" maps to `config.num_envs` parallel episodes with
  independent boundaries.

  Args:
    eval_fn: optional callback `(train_state, iteration) -> None` invoked
      every `eval_every` iterations (and after the last one).
    max_seconds: optional wall-clock budget; the loop checkpoints and
      stops cleanly once exceeded.
  """
  episode_length = episode_length or config.episode_length
  config = config.replace(episode_length=episode_length)
  steps_per_iteration = episodes_per_iteration * episode_length
  dispatcher = collectors_lib.CollectorDispatcher(
      base_dir, env_lib.NUM_ACTIONS, collectors)
  dispatcher.pre_training()

  ts = learner_lib.init_train_state(jax.random.PRNGKey(seed), env_params,
                                    field_fn, config)
  start_iteration = 0
  if checkpoint and base_dir is not None:
    ts, latest = restore_latest_checkpoint(base_dir, ts)
    start_iteration = latest + 1

  chunk_fns = {}  # num_steps -> jitted chunk (fixes round-1 recompiles).
  def get_chunk(n):
    if n not in chunk_fns:
      chunk_fns[n] = jax.jit(functools.partial(
          learner_lib.run_episode_chunk, config, env_params, num_steps=n))
    return chunk_fns[n]

  decode_fields = jax.jit(jax.vmap(field_fn))
  reset_fn = jax.jit(functools.partial(
      learner_lib.selective_reset, env_params=env_params, config=config))
  field_key = jax.random.PRNGKey(seed ^ 0x0F1E2D3C)

  renderer = None
  if render_final:
    from ble_tpu.env.rendering import renderer as renderer_lib
    renderer = renderer_lib.MatplotlibRenderer(
        env_params.station_keeping_radius_km)

  t_start = time.time()
  stop = False
  for iteration in range(start_iteration, num_iterations):
    iter_t0 = time.time()
    dispatcher.begin_episode()
    if renderer is not None and iteration == num_iterations - 1:
      renderer.reset()
    steps_done = 0
    completed_returns = []
    while steps_done < steps_per_iteration:
      # Selective per-env reset at the chunk boundary; inactive envs get
      # fresh episodes from batch-decoded fields.
      field_key, sub = jax.random.split(field_key)
      fields = decode_fields(jax.random.split(sub, config.num_envs))
      ts, reset_stats = reset_fn(ts, fields=fields)
      completed = np.asarray(reset_stats['completed'])
      if completed.any():
        completed_returns.extend(
            np.asarray(reset_stats['returns'])[completed].tolist())

      n = min(chunk_steps, steps_per_iteration - steps_done)
      ts, metrics = get_chunk(n)(ts)
      metrics = jax.tree.map(np.asarray, metrics)
      for i in range(n):
        dispatcher.step(collectors_lib.StatisticsInstance(
            step=steps_done + i,
            action=np.zeros(()),
            action_histogram=metrics['action_hist'][i],
            reward=metrics['reward'][i],
            terminal=metrics['terminals'][i]))
        if renderer is not None and iteration == num_iterations - 1:
          x, y, p, soc = metrics['path'][i]
          renderer.add_point(float(x), float(y), float(p), float(soc))
      steps_done += n
    dispatcher.end_episode(collectors_lib.StatisticsInstance(
        step=steps_done, action=np.zeros(()),
        action_histogram=np.zeros((env_lib.NUM_ACTIONS,), np.int64),
        reward=np.zeros(()), terminal=np.zeros((), np.int64)))

    dt = time.time() - iter_t0
    mean_return = (float(np.mean(completed_returns))
                   if completed_returns else float('nan'))
    logging.info(
        'iteration %d: %.0f env-steps/s, %d episodes done (mean return '
        '%.2f), loss %.4g', iteration,
        steps_per_iteration * config.num_envs / max(dt, 1e-9),
        len(completed_returns), mean_return, float(metrics['loss'][-1]))

    if checkpoint and base_dir is not None:
      save_checkpoint(base_dir, ts, iteration)
    if eval_fn is not None and eval_every > 0 and (
        iteration % eval_every == 0 or iteration == num_iterations - 1):
      eval_fn(ts, iteration)
    if max_seconds is not None and time.time() - t_start > max_seconds:
      logging.info('max_seconds (%.0f) reached at iteration %d; stopping.',
                   max_seconds, iteration)
      stop = True
    if stop:
      break

  if renderer is not None and base_dir is not None:
    image = renderer.render('rgb_array')
    try:
      import matplotlib.pyplot as plt
      path = os.path.join(base_dir, 'final_flight_path.png')
      plt.imsave(path, image)
      logging.info('saved final flight path render to %s', path)
    except Exception as e:  # matplotlib backend quirks must not kill a run.
      logging.warning('could not save final render: %s', e)
  dispatcher.end_training()
  return ts
