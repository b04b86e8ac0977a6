"""Vectorized on-device actor-learner for QR-DQN / DQN.

Replaces the reference's process-level RL parallelism (128 Launchpad actor
processes -> Reverb -> one learner; ``distributed_train_acme_qrdqn.py``,
SURVEY.md 2.6) with a single-program design: E vectorized envs step in
lockstep on-device, write into the on-device replay ring, and the learner
takes `E * samples_per_insert / batch_size` gradient steps per env step --
the same samples-per-insert ratio as the reference's Acme config (SPI=8)
and Dopamine's update_period=4 with batch 32.

Everything here is pure functions over a `TrainState` pytree; the
multi-chip variant shards the env/replay axis over a mesh and pmeans
gradients (ble_tpu/parallel/distributed.py).
"""

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ble_tpu.agents import marco_polo
from ble_tpu.agents import qrdqn as qrdqn_lib
from ble_tpu.agents import replay as replay_lib
from ble_tpu.env import env as env_lib


@struct.dataclass
class TrainConfig:
  num_envs: int = 1024
  episode_length: int = 960
  samples_per_insert: float = 8.0
  use_marco_polo: bool = True
  qrdqn: qrdqn_lib.QrDqnConfig = struct.field(default_factory=qrdqn_lib.QrDqnConfig)
  replay: replay_lib.ReplayConfig = struct.field(
      default_factory=replay_lib.ReplayConfig)

  def grad_steps_per_env_step(self) -> int:
    return max(1, round(self.num_envs * self.samples_per_insert /
                        self.replay.batch_size))


@struct.dataclass
class TrainState:
  env_state: env_lib.EnvState  # Batched (E, ...).
  obs: jnp.ndarray  # (E, obs_dim)
  active: jnp.ndarray  # (E,) bool: env not yet terminal this episode.
  episode_step: jnp.ndarray  # int32 step within the episode (shared).
  mp: marco_polo.MarcoPoloState  # Batched.
  learner: qrdqn_lib.LearnerState
  replay: replay_lib.ReplayState
  key: jax.Array
  env_steps: jnp.ndarray  # int64-ish total env steps (int32 ok here).


def init_train_state(key: jax.Array, env_params: env_lib.EnvParams,
                     field_fn: Callable, config: TrainConfig) -> TrainState:
  env_key, mp_key, learner_key, loop_key = jax.random.split(key, 4)
  env_keys = jax.random.split(env_key, config.num_envs)
  env_state, obs = jax.vmap(
      lambda k: env_lib.reset(k, env_params, field_fn))(env_keys)

  mp_keys = jax.random.split(mp_key, config.num_envs)
  mp = jax.vmap(marco_polo.begin_episode)(mp_keys)

  learner = qrdqn_lib.init(learner_key, config.qrdqn, obs.shape[-1])
  replay = replay_lib.init(config.num_envs, obs.shape[-1], config.replay)

  return TrainState(
      env_state=env_state, obs=obs,
      active=jnp.ones((config.num_envs,), jnp.bool_),
      episode_step=jnp.int32(0), mp=mp, learner=learner, replay=replay,
      key=loop_key, env_steps=jnp.int32(0))


def reset_episode(ts: TrainState, env_params: env_lib.EnvParams,
                  field_fn: Callable, config: TrainConfig) -> TrainState:
  """Fresh episode for every env (lockstep episode boundaries)."""
  key, env_key, mp_key = jax.random.split(ts.key, 3)
  env_keys = jax.random.split(env_key, config.num_envs)
  env_state, obs = jax.vmap(
      lambda k: env_lib.reset(k, env_params, field_fn))(env_keys)
  mp = jax.vmap(marco_polo.begin_episode)(
      jax.random.split(mp_key, config.num_envs))
  return ts.replace(env_state=env_state, obs=obs,
                    active=jnp.ones((config.num_envs,), jnp.bool_),
                    episode_step=jnp.int32(0), mp=mp, key=key)


def env_step(config: TrainConfig, env_params: env_lib.EnvParams,
             ts: TrainState, grad_transform=None
             ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
  """One lockstep actor step + learner updates."""
  key, mp_key, sample_key = jax.random.split(ts.key, 3)

  rl_actions = qrdqn_lib.select_action(config.qrdqn, ts.learner.params, ts.obs,
                                   None, epsilon=0.0)
  if config.use_marco_polo:
    mp_keys = jax.random.split(mp_key, config.num_envs)
    mp, actions = jax.vmap(marco_polo.step)(ts.mp, ts.obs, rl_actions,
                                            mp_keys)
  else:
    mp, actions = ts.mp, rl_actions

  out = env_lib.step_batched(env_params, ts.env_state, actions)

  terminal = jnp.logical_and(ts.active, out.done)
  rep = replay_lib.add(ts.replay, config.replay, ts.obs, actions, out.reward,
                       terminal, ts.active,
                       jnp.full((config.num_envs,), ts.episode_step))

  learner = ts.learner
  can = replay_lib.can_sample(rep, config.replay,
                              config.qrdqn.min_replay_history)

  def do_updates(carry):
    learner, rep = carry
    def body(i, carry):
      learner, rep, metrics_sum = carry
      batch = replay_lib.sample(rep, config.replay,
                                jax.random.fold_in(sample_key, i))
      learner, metrics = qrdqn_lib.train_step(config.qrdqn, learner, batch,
                                          grad_transform)
      if config.replay.prioritized:
        rep = replay_lib.update_priorities(rep, config.replay,
                                           batch['env_idx'], batch['slot'],
                                           metrics['per_sample_loss'])
      return learner, rep, metrics_sum + metrics['loss']
    n = config.grad_steps_per_env_step()
    learner, rep, loss_sum = jax.lax.fori_loop(
        0, n, body, (learner, rep, jnp.float32(0.0)))
    return learner, rep, loss_sum / n

  learner, rep, mean_loss = jax.lax.cond(
      can, do_updates, lambda c: (c[0], c[1], jnp.float32(0.0)),
      (learner, rep))

  new_active = jnp.logical_and(ts.active, jnp.logical_not(out.done))
  metrics = {
      'reward': jnp.mean(jnp.where(ts.active, out.reward, 0.0)),
      'loss': mean_loss,
      'active_frac': jnp.mean(new_active.astype(jnp.float32)),
  }
  ts = ts.replace(env_state=out.state, obs=out.observation, active=new_active,
                  episode_step=ts.episode_step + 1, mp=mp, learner=learner,
                  replay=rep, key=key, env_steps=ts.env_steps + 1)
  return ts, metrics


def run_episode_chunk(config: TrainConfig, env_params: env_lib.EnvParams,
                      ts: TrainState, num_steps: int, grad_transform=None):
  """Scans `num_steps` lockstep env steps; returns (state, stacked metrics).

  Chunk boundaries double as the GP's exact-inverse refresh cadence
  (wind_gp.REFRESH_PERIOD rationale): one batched Cholesky per env per
  chunk washes out the incremental updates' float32 drift at negligible
  amortized cost.
  """
  from ble_tpu.env import wind_gp
  ts = ts.replace(env_state=ts.env_state.replace(
      gp=jax.vmap(wind_gp.refresh)(ts.env_state.gp)))
  def body(ts, _):
    return env_step(config, env_params, ts, grad_transform)
  return jax.lax.scan(body, ts, None, length=num_steps)


def make_eval_policy(config: TrainConfig, learner_params):
  """(policy_init, policy_step) pair for eval_lib with greedy actions."""
  def policy_init(key):
    del key
    return ()

  def policy_step(state, obs, key):
    del key
    action = qrdqn_lib.select_action(config.qrdqn, learner_params, obs, None,
                                 epsilon=0.0)
    return state, action

  return policy_init, policy_step
