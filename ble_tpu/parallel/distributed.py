"""Multi-chip training: envs sharded over a device mesh, learner replicated.

TPU-native replacement for the reference's Launchpad/Reverb process graph
(``distributed_train_acme_qrdqn.py``, SURVEY.md 2.6/5.8): instead of 128
actor processes RPC-ing transitions to a central replay server, the env
batch and its replay ring are SHARDED along a mesh `env` axis (each chip
steps and stores its local balloons), the QR-DQN learner parameters are
replicated, and gradient synchronization is one `pmean` over ICI inside
the jitted step. Replay sampling stays shard-local, so only gradients (and
scalar metrics) cross the interconnect. Multi-host runs only additionally
need `jax.distributed.initialize`; the program is identical.

Parallelism note (SURVEY.md 2.6): the reference's largest network is an
8x600 MLP, so data parallelism over envs IS the real sharding strategy
for this workload; there is no attention/sequence axis and no expert
layer, hence no TP/PP/SP/EP axes to shard. The DP learner step below
synchronizes with a single ICI all-reduce.
"""

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ble_tpu.agents import replay as replay_lib
from ble_tpu.env import env as env_lib
from ble_tpu.train import learner as learner_lib

ENV_AXIS = 'env'


def make_mesh(n_devices: int = None) -> Mesh:
  devices = jax.devices()
  if n_devices is not None:
    devices = devices[:n_devices]
  return Mesh(devices, (ENV_AXIS,))


def shard_specs(ts: learner_lib.TrainState) -> learner_lib.TrainState:
  """PartitionSpec pytree: env-batched leaves sharded on ENV_AXIS,
  learner state and shared counters replicated."""
  def batched(tree):
    return jax.tree.map(lambda leaf: P(ENV_AXIS), tree)

  def replicated(tree):
    return jax.tree.map(lambda leaf: P(), tree)

  return learner_lib.TrainState(
      env_state=batched(ts.env_state),
      obs=P(ENV_AXIS),
      active=P(ENV_AXIS),
      episode_step=P(ENV_AXIS),
      episode_return=P(ENV_AXIS),
      mp=batched(ts.mp),
      learner=replicated(ts.learner),
      actor=batched(ts.actor),  # (E, ...) recurrent lanes; () otherwise.
      replay=replay_lib.ReplayState(
          obs=P(ENV_AXIS), action=P(ENV_AXIS), reward=P(ENV_AXIS),
          terminal=P(ENV_AXIS), valid=P(ENV_AXIS),
          episode_step=P(ENV_AXIS), priority=P(ENV_AXIS), total=P()),
      key=P(),
      env_steps=P(),
      episodes_done=P())


def build_distributed_step(mesh: Mesh, config: learner_lib.TrainConfig,
                           env_params: env_lib.EnvParams,
                           num_steps: int = 1) -> Callable:
  """Jitted `step(train_state) -> (train_state, metrics)` over the mesh.

  `config.num_envs` is the GLOBAL env count (divisible by mesh size). Each
  shard runs `num_steps` lockstep env steps with shard-local replay and
  pmean'd gradients.
  """
  n_dev = mesh.devices.size
  assert config.num_envs % n_dev == 0, (config.num_envs, n_dev)
  local_config = config.replace(num_envs=config.num_envs // n_dev)

  def local_step(ts: learner_lib.TrainState):
    idx = jax.lax.axis_index(ENV_AXIS)
    base_key = ts.key
    # Per-shard RNG stream for this chunk; the carried key stays replicated
    # by advancing it from the (replicated) base key.
    ts = ts.replace(key=jax.random.fold_in(base_key, idx))
    grad_transform = lambda g: jax.lax.pmean(g, ENV_AXIS)
    ts, metrics = learner_lib.run_episode_chunk(
        local_config, env_params, ts, num_steps, grad_transform)
    # Counts are summed across shards; means averaged; env-0 debug track
    # taken from shard 0 is meaningless globally, so it is dropped here.
    metrics.pop('path', None)
    counts = ('action_hist', 'terminals')
    metrics = {
        k: (jax.lax.psum(v, ENV_AXIS) if k in counts
            else jax.lax.pmean(v, ENV_AXIS))
        for k, v in metrics.items()
    }
    ts = ts.replace(key=jax.random.fold_in(base_key, 0x5EED))
    return ts, metrics

  def step(ts: learner_lib.TrainState):
    specs = shard_specs(ts)
    fn = jax.shard_map(local_step, mesh=mesh, in_specs=(specs,),
                       out_specs=(specs, P()), check_vma=False)
    return fn(ts)

  return jax.jit(step)


def build_distributed_reset(mesh: Mesh, config: learner_lib.TrainConfig,
                            env_params: env_lib.EnvParams) -> Callable:
  """Jitted `reset(train_state, fields) -> (train_state, stats)` over the
  mesh: the selective per-env auto-reset (learner.selective_reset) with the
  batch-decoded field pool sharded along the env axis."""
  n_dev = mesh.devices.size
  assert config.num_envs % n_dev == 0, (config.num_envs, n_dev)
  local_config = config.replace(num_envs=config.num_envs // n_dev)

  def local_reset(ts: learner_lib.TrainState, fields):
    idx = jax.lax.axis_index(ENV_AXIS)
    base_key = ts.key
    base_done = ts.episodes_done
    ts = ts.replace(key=jax.random.fold_in(base_key, idx ^ 0x2E5E7))
    ts, stats = learner_lib.selective_reset(ts, env_params, local_config,
                                            fields)
    # Keep the replicated lanes replicated: one shared key advance, and
    # episode counting via a psum of the per-shard increments.
    increment = jax.lax.psum(ts.episodes_done - base_done, ENV_AXIS)
    ts = ts.replace(key=jax.random.fold_in(base_key, 0xD0E),
                    episodes_done=base_done + increment)
    return ts, stats

  def reset(ts: learner_lib.TrainState, fields):
    specs = shard_specs(ts)
    stats_spec = {'completed': P(ENV_AXIS), 'returns': P(ENV_AXIS),
                  'lengths': P(ENV_AXIS)}
    fn = jax.shard_map(local_reset, mesh=mesh,
                       in_specs=(specs, P(ENV_AXIS)),
                       out_specs=(specs, stats_spec), check_vma=False)
    return fn(ts, fields)

  return jax.jit(reset)


def init_distributed_train_state(key: jax.Array, mesh: Mesh,
                                 config: learner_lib.TrainConfig,
                                 env_params: env_lib.EnvParams,
                                 field_fn: Callable
                                 ) -> learner_lib.TrainState:
  """Initializes a global TrainState laid out according to the mesh."""
  ts = learner_lib.init_train_state(key, env_params, field_fn, config)
  specs = shard_specs(ts)
  shardings = jax.tree.map(lambda spec: NamedSharding(mesh, spec), specs,
                           is_leaf=lambda x: isinstance(x, P))
  return jax.device_put(ts, shardings)
