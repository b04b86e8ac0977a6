"""Vectorized evaluation: a whole suite of seeds in one lax.scan.

Re-design of the reference per-seed Python eval loop
(``eval/eval_lib.py:123-211``): all seeds roll in lockstep as a vmapped
batch, the 960-step episode is a `lax.scan`, and terminal envs are masked
(the reference breaks out of its loop). Semantics preserved:

  - reward accumulates through the terminal step inclusive;
  - time_within_radius = steps_within_radius / steps_taken;
  - terminal causes and final_timestep per seed.

Sharding across devices (the reference's --num_shards CLI) becomes a
jax.sharding positional sharding of the seed batch (see
ble_tpu/parallel/).
"""

import dataclasses
import functools
import json
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ble_tpu.env import env as env_lib
from ble_tpu.env import wind_field as wind_field_lib
from ble_tpu.env import wind_gp as wind_gp_lib


@dataclasses.dataclass
class EvaluationResult:
  """Per-seed result (reference eval_lib.py:83-121)."""
  seed: int
  cumulative_reward: float
  time_within_radius: float
  out_of_power: bool
  envelope_burst: bool
  zeropressure: bool
  final_timestep: int
  flight_path: Optional[List[Dict[str, float]]] = None

  def __str__(self):
    return (f'EvaluationResult(seed={self.seed}, '
            f'cumulative_reward={self.cumulative_reward}, '
            f'time_within_radius={self.time_within_radius}, '
            f'out_of_power={self.out_of_power}, '
            f'final_timestep={self.final_timestep})')


def seed_to_key(seed):
  """Matches the reference's split structure: env.seed makes PRNGKey(seed)
  and reset hands the arena the second split (balloon_env.py:253,213)."""
  return jax.random.split(jax.random.PRNGKey(seed))[1]


def build_parametric_eval_fn(env_params: env_lib.EnvParams,
                             field_fn: Callable,
                             policy_init: Callable,
                             policy_step: Callable,
                             max_steps: int = 960,
                             record_flight_path: bool = False):
  """Like `build_eval_fn`, but the policy takes leading `params`.

  policy_init(params, key) -> state; policy_step(params, state, obs, key)
  -> (state, action). Returns eval_fn(params, seeds) which jits ONCE and
  is reused across a training run (params are a traced argument, not
  baked-in constants) — this is what periodic learning-curve evals use.
  """
  base = build_eval_fn(
      env_params, field_fn,
      policy_init=policy_init, policy_step=policy_step,
      max_steps=max_steps, record_flight_path=record_flight_path,
      _parametric=True)
  return base


def build_eval_fn(env_params: env_lib.EnvParams,
                  field_fn: Callable,
                  policy_init: Callable,
                  policy_step: Callable,
                  max_steps: int = 960,
                  record_flight_path: bool = False,
                  mesh=None,
                  _parametric: bool = False,
                  from_states: bool = False):
  """Returns a jitted function evaluating a batch of seeds.

  Args:
    env_params: environment parameters.
    field_fn: wind field sampler for reset.
    policy_init: key -> policy state (per env).
    policy_step: (policy_state, obs, key) -> (policy_state, action).
    max_steps: episode cap (suites use 960).
    record_flight_path: also return (B, T, 6) [x_km, y_km, pressure, super-
      pressure, elapsed_s, soc] trajectories.
    mesh: optional 1-axis jax.sharding.Mesh; the seed batch (and hence
      every env) is sharded across its devices — the multi-chip version
      of the reference's --num_shards seed slicing (eval/eval.py:125-128),
      with no result merging step.
    from_states: the returned function takes (seeds, env_states, obs) with
      pre-built per-seed initial states (e.g. parity_reset's
      reference-ordered worlds for PAIRED reference comparisons) instead
      of resetting internally; seeds then only derive policy keys.

  Returns:
    eval_fn(seeds: int32 (B,)) -> dict of result arrays (or
    eval_fn(seeds, env_states, obs) when `from_states`).
  """
  reset = functools.partial(env_lib.reset, params=env_params,
                            field_fn=field_fn)
  # With the field-slab cache on, steps inside the chunked scans run
  # refresh='never' and the slab re-centers at field_cache_every-step
  # sub-chunk boundaries below (cond-free cadence; without it the
  # single-env step re-centers EVERY step, a full grid read PLUS the
  # slab rebuild -- strictly slower than no cache. ADVICE r3).
  # The cadence only exists when the GP refresh period is a whole number
  # of cache sub-chunks; otherwise refresh='never' would leave the slab
  # pinned for a whole 64-step chunk and clamped edge winds would be
  # returned silently (ADVICE r4 medium) -- fall back to per-step
  # refresh='auto' in that (non-default, never used by the CLIs) case.
  cached = env_params.field_cache
  use_cache_cadence = (
      cached and wind_gp_lib.REFRESH_PERIOD % env_params.field_cache_every == 0)
  step = functools.partial(env_lib.step, env_params,
                           refresh='never' if use_cache_cadence else 'auto')
  radius_km = env_params.station_keeping_radius_km

  if _parametric:
    pinit, pstep = policy_init, policy_step
  else:
    pinit = lambda params, key: policy_init(key)
    pstep = lambda params, state, obs, key: policy_step(state, obs, key)

  def single(params, seed, env_state=None, obs=None):
    key = seed_to_key(seed)
    if not from_states:
      env_state, obs = reset(key)
    pkey, akey = jax.random.split(jax.random.fold_in(key, 1))
    pstate = pinit(params, pkey)
    pstate, action = pstep(params, pstate, obs, akey)

    def body(carry, step_key):
      env_state, pstate, action, active, acc = carry
      out = step(env_state, action)
      dist_km = jnp.sqrt(out.state.balloon.x_m ** 2 +
                         out.state.balloon.y_m ** 2) / 1000.0
      acc = {
          'reward': acc['reward'] + jnp.where(active, out.reward, 0.0),
          'within': acc['within'] + jnp.where(
              jnp.logical_and(active, dist_km <= radius_km), 1, 0),
          'steps': acc['steps'] + jnp.where(active, 1, 0),
          'out_of_power': jnp.logical_or(
              acc['out_of_power'],
              jnp.logical_and(active, out.info['out_of_power'])),
          'burst': jnp.logical_or(
              acc['burst'],
              jnp.logical_and(active, out.info['envelope_burst'])),
          'zeropressure': jnp.logical_or(
              acc['zeropressure'],
              jnp.logical_and(active, out.info['zeropressure'])),
      }
      active = jnp.logical_and(active, jnp.logical_not(out.done))
      pstate, action = pstep(params, pstate, out.observation, step_key)
      path = None
      if record_flight_path:
        b = out.state.balloon
        path = jnp.stack([
            b.x_m / 1000.0, b.y_m / 1000.0, b.pressure_pa,
            b.superpressure_pa, b.time_elapsed_s.astype(jnp.float32),
            out.info['battery_soc']])
      return (out.state, pstate, action, active, acc), path

    acc0 = {
        'reward': jnp.float32(0.0),
        'within': jnp.int32(0),
        'steps': jnp.int32(0),
        'out_of_power': jnp.bool_(False),
        'burst': jnp.bool_(False),
        'zeropressure': jnp.bool_(False),
    }
    step_keys = jax.random.split(jax.random.fold_in(key, 2), max_steps)

    # Nested scan: an exact GP-inverse refresh (wind_gp.REFRESH_PERIOD)
    # between inner chunks bounds f32 drift of the incremental bordered
    # updates over the 960-step episode to <1e-3 m/s (measured 1.5e-2
    # without; tests/test_wind.py::test_wind_gp_960_step_churn_drift).
    # Doing it between chunks costs one 128^3 Cholesky per 64 steps
    # (amortized ~33 kFLOP/step/env) instead of a per-step lax.cond whose
    # vmapped select would run the Cholesky every step.
    period = wind_gp_lib.REFRESH_PERIOD
    n_chunks = max_steps // period
    remainder = max_steps - n_chunks * period
    cache_k = env_params.field_cache_every

    def subchunk(carry, sub_keys):
      env_state = carry[0]
      env_state = env_state.replace(wind=wind_field_lib.refresh_slab(
          env_state.wind, env_state.balloon.x_m, env_state.balloon.y_m))
      return jax.lax.scan(body, (env_state,) + carry[1:], sub_keys)

    def chunk(carry, chunk_keys):
      env_state = carry[0]
      env_state = env_state.replace(gp=wind_gp_lib.refresh(env_state.gp))
      carry = (env_state,) + carry[1:]
      if use_cache_cadence:
        carry, paths = jax.lax.scan(
            subchunk, carry,
            chunk_keys.reshape(period // cache_k, cache_k, -1))
        paths = None if paths is None else paths.reshape(
            (period,) + paths.shape[2:])
        return carry, paths
      return jax.lax.scan(body, carry, chunk_keys)

    carry = (env_state, pstate, action, jnp.bool_(True), acc0)
    if n_chunks:
      carry, paths = jax.lax.scan(
          chunk, carry,
          step_keys[:n_chunks * period].reshape(n_chunks, period, -1))
      paths = None if paths is None else paths.reshape(
          n_chunks * period, *paths.shape[2:])
    else:
      paths = None
    if remainder:
      # Tail shorter than a GP chunk: per-step slab re-center keeps it
      # exact without its own cadence bookkeeping (suites use 960 = a
      # whole number of chunks, so this path is cold).
      def tail_body(carry, step_key):
        if use_cache_cadence:
          env_state = carry[0]
          env_state = env_state.replace(wind=wind_field_lib.refresh_slab(
              env_state.wind, env_state.balloon.x_m, env_state.balloon.y_m))
          carry = (env_state,) + carry[1:]
        return body(carry, step_key)
      carry, tail_paths = jax.lax.scan(tail_body, carry,
                                       step_keys[-remainder:])
      if record_flight_path:
        paths = (tail_paths if paths is None else
                 jnp.concatenate([paths, tail_paths], axis=0))
    env_state, _, _, _, acc = carry

    result = {
        'cumulative_reward': acc['reward'],
        'time_within_radius': acc['within'].astype(jnp.float32) /
                              jnp.maximum(acc['steps'], 1),
        'final_timestep': acc['steps'],
        'out_of_power': acc['out_of_power'],
        'envelope_burst': acc['burst'],
        'zeropressure': acc['zeropressure'],
    }
    if record_flight_path:
      result['flight_path'] = paths
    return result

  if from_states:
    batched_s = jax.vmap(single, in_axes=(None, 0, 0, 0))
    if _parametric:
      return jax.jit(batched_s)
    return jax.jit(functools.partial(batched_s, None))

  batched = jax.vmap(single, in_axes=(None, 0))
  if _parametric:
    return jax.jit(batched)
  if mesh is None:
    return jax.jit(functools.partial(batched, None))

  from jax.sharding import NamedSharding, PartitionSpec as P
  axis = mesh.axis_names[0]
  sharded = jax.jit(functools.partial(batched, None),
                    in_shardings=NamedSharding(mesh, P(axis)),
                    out_shardings=NamedSharding(mesh, P(axis)))

  def eval_fn(seeds):
    return sharded(jax.device_put(seeds, NamedSharding(mesh, P(axis))))

  return eval_fn


def evaluate(eval_fn, seeds: Sequence[int], batch_size: int = 0
             ) -> List[EvaluationResult]:
  """Runs eval_fn over seeds (optionally chunked) and unpacks results."""
  seeds = np.asarray(seeds, np.int32)
  if batch_size <= 0:
    batch_size = len(seeds)
  chunks = []
  for start in range(0, len(seeds), batch_size):
    chunk = seeds[start:start + batch_size]
    pad = batch_size - len(chunk)
    padded = np.concatenate([chunk, np.zeros(pad, np.int32)]) if pad else chunk
    out = jax.tree.map(np.asarray, eval_fn(jnp.asarray(padded)))
    if pad:
      out = jax.tree.map(lambda x: x[:len(chunk)], out)
    chunks.append(out)
  merged = jax.tree.map(lambda *xs: np.concatenate(xs), *chunks)

  results = []
  for i, seed in enumerate(seeds):
    fp = None
    if 'flight_path' in merged:
      steps = int(merged['final_timestep'][i])
      fp = [
          {'x': float(row[0]), 'y': float(row[1]), 'pressure': float(row[2]),
           'superpressure': float(row[3]), 'elapsed_seconds': float(row[4]),
           'power': float(row[5])}
          for row in merged['flight_path'][i][:steps]
      ]
    results.append(EvaluationResult(
        seed=int(seed),
        cumulative_reward=float(merged['cumulative_reward'][i]),
        time_within_radius=float(merged['time_within_radius'][i]),
        out_of_power=bool(merged['out_of_power'][i]),
        envelope_burst=bool(merged['envelope_burst'][i]),
        zeropressure=bool(merged['zeropressure'][i]),
        final_timestep=int(merged['final_timestep'][i]),
        flight_path=fp))
  return results


def write_results_json(results: List[EvaluationResult], path: str,
                       agent_name: str = '', suite_name: str = '') -> None:
  """JSON output compatible in spirit with reference eval/eval.py:75-96."""
  payload = {
      'agent': agent_name,
      'suite': suite_name,
      'results': [dataclasses.asdict(r) for r in results],
  }
  with open(path, 'w') as f:
    json.dump(payload, f)


def combine_shard_results(paths: Sequence[str]) -> List[Dict[str, Any]]:
  """Merges per-shard JSON outputs (reference eval/combine_eval_shards.py)."""
  combined = []
  for p in paths:
    with open(p) as f:
      combined.extend(json.load(f)['results'])
  combined.sort(key=lambda r: r['seed'])
  return combined


def summarize(results: List[EvaluationResult]) -> Dict[str, float]:
  return {
      'mean_cumulative_reward': float(
          np.mean([r.cumulative_reward for r in results])),
      'mean_twr': float(np.mean([r.time_within_radius for r in results])),
      'num_terminated': int(sum(r.final_timestep < 960 for r in results)),
      'num_seeds': len(results),
  }
