"""Optional tensor-parallel sharding of the Q-network learner.

The reference's largest network is an 8x600 MLP, so tensor parallelism is
NOT needed for this workload (SURVEY.md 2.6) -- data parallelism over envs
is the production sharding (parallel/distributed.py). This module exists
to demonstrate the capability for larger policy networks: a 2-D
(env, model) mesh where Dense kernels alternate column-/row-parallel
(Megatron-style) via GSPMD sharding annotations; XLA inserts the
all-reduces on the `model` axis automatically.
"""

import re
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = 'env'
MODEL_AXIS = 'model'


def make_2d_mesh(env_devices: int, model_devices: int) -> Mesh:
  devices = jax.devices()[:env_devices * model_devices]
  import numpy as np
  grid = np.asarray(devices).reshape(env_devices, model_devices)
  return Mesh(grid, (ENV_AXIS, MODEL_AXIS))


def param_specs(params: Any) -> Any:
  """PartitionSpec tree: alternate column-parallel (shard output features)
  and row-parallel (shard input features) Dense layers."""
  flat = jax.tree_util.tree_flatten_with_path(params)[0]

  def spec_for(path, leaf):
    names = [str(getattr(p, 'key', p)) for p in path]
    dense_idx = None
    for n in names:
      m = re.match(r'Dense_(\d+)', n)
      if m:
        dense_idx = int(m.group(1))
    if dense_idx is None or leaf.ndim == 0:
      return P()
    column_parallel = dense_idx % 2 == 0
    if any('kernel' in n for n in names):
      return P(None, MODEL_AXIS) if column_parallel else P(MODEL_AXIS, None)
    if any('bias' in n for n in names):
      return P(MODEL_AXIS) if column_parallel else P()
    return P()

  return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
  specs = param_specs(params)
  return jax.device_put(
      params,
      jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                   is_leaf=lambda x: isinstance(x, P)))


def build_tp_train_step(mesh: Mesh, config, obs_dim: int):
  """Jitted quantile-loss gradient step with (env, model)-sharded params
  and env-sharded batches. Returns (init_fn, step_fn)."""
  from ble_tpu.agents import qrdqn

  def init_fn(key):
    state = qrdqn.init(key, config, obs_dim)
    pspecs = param_specs(state.params)
    to_sharding = lambda tree: jax.tree.map(
        lambda s: NamedSharding(mesh, s), tree,
        is_leaf=lambda x: isinstance(x, P))
    state = state.replace(
        params=jax.device_put(state.params, to_sharding(pspecs)),
        target_params=jax.device_put(state.target_params,
                                     to_sharding(pspecs)))
    return state

  batch_sharding = NamedSharding(mesh, P(ENV_AXIS))

  @jax.jit
  def step_fn(state, batch):
    batch = jax.lax.with_sharding_constraint(
        batch, {k: batch_sharding for k in batch})
    return qrdqn.train_step(config, state, batch)

  return init_fn, step_fn
