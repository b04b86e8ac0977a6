"""Headline benchmark: env-steps/s/chip at BENCH_NUM_ENVS envs (default 4096).

Measures the fully fused environment step (physics substeps + wind
interpolation + simplex noise + GP feature construction + reward) with
generative VAE wind fields, vmapped over BENCH_NUM_ENVS envs under jit,
on one chip. The 16384-env default needs ~5 GB of HBM peak (2x the env
state; see rollout() below) -- on accelerators smaller than 16 GB set
BENCH_NUM_ENVS lower (4096 ran fine on all tested devices).

Baseline: the reference runs ~9 env-steps/s on one GPU including the agent
(docs/getting_started.rst:127-133; BASELINE.md). vs_baseline is the speedup
over that number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# 4096 default (was 16384): the step is bandwidth-floored PER ENV once
# the pipeline is honestly measured, so batch width past 4096 buys
# little -- and 16384-env resets through the remote-TPU tunnel have
# been observed to stall >20 min, which a driver-run bench must not
# risk. Set BENCH_NUM_ENVS to override.
NUM_ENVS = int(os.environ.get('BENCH_NUM_ENVS', '4096'))
NUM_STEPS = int(os.environ.get('BENCH_NUM_STEPS', '32'))
BASELINE_STEPS_PER_S = 9.0

# 'window' (default): the K-step staged rollout (env.rollout_window) --
# physics/wind wide scan, then the K-step VMEM-resident GP kernel, then
# wide feature assembly. Computes exactly what K per-step calls compute
# for this bench's open-loop random policy (actions depend on the step
# KEY, not the observation; parity pinned by tests/test_rollout_window.py).
# 'perstep': the closed-loop per-step path (what training actors with
# obs-dependent policies use). Measured round 5 on the tunneled v5e:
# window 302k env-steps/s, perstep 257k at 4096 envs
# (docs/benchmarks.md); both compile in seconds after the round-5
# Mosaic restructure.
MODE = os.environ.get('BENCH_MODE', 'window')


def main():
  backend = jax.default_backend()
  num_envs = NUM_ENVS
  if backend == 'cpu':
    num_envs = min(num_envs, 256)

  from ble_tpu.env import env as env_lib
  from ble_tpu.generative import vae

  # Windowed field-slab cache (EnvParams.field_cache): per-step wind
  # queries read a 4x4 lat/lng window instead of the full 21x21 grid,
  # cutting the step's largest HBM stream (docs/benchmarks.md roofline).
  field_cache = os.environ.get('BENCH_FIELD_CACHE', '1') == '1'
  env_params = env_lib.EnvParams(field_cache=field_cache)
  wind_kind = os.environ.get('BENCH_WIND', 'generative')
  if wind_kind == 'generative':
    decoder_params = vae.init_decoder_params(jax.random.PRNGKey(0))
    field_fn = env_lib.make_field_fn('generative', decoder_params)
  else:
    field_fn = env_lib.make_field_fn('static')

  reset_b = jax.jit(jax.vmap(
      functools.partial(env_lib.reset, params=env_params, field_fn=field_fn)))
  reset_chunk = int(os.environ.get('BENCH_RESET_CHUNK', '512'))

  unroll = int(os.environ.get('BENCH_UNROLL', '1'))

  def rollout(state, keys):
    """Scans NUM_STEPS env steps and returns ONLY scalar statistics.

    The remote-TPU tunnel used in this container downloads every jit
    output to the host, so returning the multi-GB env state per call
    would measure network bandwidth, not the simulator. Sustained
    throughput is the per-step cost inside one long scan; on a directly
    attached TPU the state can be chained across calls instead.

    NOT donated: the same input state is reused for every timing round,
    so peak HBM is 2x the env state (input + scan carry) instead of the
    old 3-pre-staged-copies scheme's 4x -- 32768 envs (~5 GB state) now
    fits a 16 GB chip. `unroll` amortizes per-iteration launch overhead;
    that only matters in the launch-bound regime at small batches
    (<=4096 envs) -- at the 16384 default the step is compute/bandwidth
    bound and unroll is within noise (docs/benchmarks.md ablation).
    """
    def body(carry, key):
      # Random policy (BASELINE config 3: random agent; env count from
      # BENCH_NUM_ENVS).
      actions = jax.random.randint(key, (num_envs,), 0, 3)
      out = env_lib.step_batched(env_params, carry, actions,
                                 refresh='never')
      # The OBSERVATION must be consumed: the reward depends only on the
      # balloon position, so a reward-only rollout lets XLA dead-code
      # eliminate the entire GP-observe + feature pipeline -- the
      # dominant real cost. Rounds 1-3 benched exactly that hollow step
      # (22x optimistic at 4096 envs; docs/benchmarks.md round-4
      # postmortem). One scalar reduction per step keeps it live at
      # negligible cost.
      return out.state, out.reward + 1e-12 * jnp.sum(out.observation)
    # Window length: the slab-cache cadence when the cache is on (the
    # boundary re-center honors the cache's speed bound); BENCH_WINDOW
    # may lengthen it in uncached runs (K-scaling measurements).
    k = env_params.field_cache_every
    if not field_cache and MODE == 'window':
      k = int(os.environ.get('BENCH_WINDOW', str(k)))
    if keys.shape[0] % k:
      raise ValueError(
          f'BENCH_NUM_STEPS={keys.shape[0]} must be a multiple of '
          f'the window/cache chunk {k} (or set BENCH_FIELD_CACHE=0)')

    if MODE == 'window':
      # Window length = the slab-cache cadence, so the slab re-center at
      # each window boundary honors the cache's documented speed bound.
      def wchunk(carry, chunk_keys):
        if field_cache:
          carry = env_lib.refresh_field_cache(carry)
        actions = jax.vmap(
            lambda kk: jax.random.randint(kk, (num_envs,), 0, 3))(chunk_keys)
        out = env_lib.rollout_window(env_params, carry, actions)
        # Same per-step observation consumption as the per-step mode.
        return out.state, out.reward + 1e-12 * jnp.sum(out.observation,
                                                       axis=-1)
      state, rewards = jax.lax.scan(
          wchunk, state, keys.reshape(keys.shape[0] // k, k, -1))
    elif field_cache:
      # Cond-free cadence: an unconditional slab re-center at every
      # `field_cache_every`-step chunk boundary of a nested scan (a
      # traced lax.cond would force layout copies of the multi-GB
      # carried field).
      def chunk(carry, chunk_keys):
        carry = env_lib.refresh_field_cache(carry)
        return jax.lax.scan(body, carry, chunk_keys, unroll=unroll)
      state, rewards = jax.lax.scan(
          chunk, state, keys.reshape(keys.shape[0] // k, k, -1))
    else:
      state, rewards = jax.lax.scan(body, state, keys, unroll=unroll)
    return rewards.sum(), rewards.mean()

  rollout = jax.jit(rollout)

  def note(msg):
    # Progress to stderr (stdout is reserved for the single JSON line) so
    # a driver-run bench that stalls shows WHERE: reset, compile, or run.
    print(f'[bench +{time.perf_counter() - t_start:.0f}s] {msg}',
          file=sys.stderr, flush=True)

  t_start = time.perf_counter()
  # Reset in chunks: the one-time reset (VAE decode + sunrise search) has a
  # larger live set than the steady-state step.
  keys = jax.random.split(jax.random.PRNGKey(42), num_envs)
  parts = []
  for i in range(0, num_envs, reset_chunk):
    parts.append(reset_b(keys[i:i + reset_chunk]))
    note(f'reset chunk {i // reset_chunk + 1}/{-(-num_envs // reset_chunk)}')
  state = jax.tree.map(lambda *xs: jnp.concatenate(xs), *[p[0] for p in parts])
  obs = jnp.concatenate([p[1] for p in parts])
  jax.block_until_ready(obs)
  note('resets done; compiling rollout')

  step_keys = jax.random.split(jax.random.PRNGKey(7), NUM_STEPS)
  total, _ = rollout(state, step_keys)  # Warmup / compile.
  float(total)  # Forced host fetch: real device sync.
  note('warmup done; timing')

  times = []
  for i in range(3):
    ks = jax.random.split(jax.random.PRNGKey(100 + i), NUM_STEPS)
    t0 = time.perf_counter()
    total, _ = rollout(state, ks)
    float(total)
    times.append(time.perf_counter() - t0)
  elapsed = min(times)

  env_steps_per_s = num_envs * NUM_STEPS / elapsed

  print(json.dumps({
      'metric': f'env-steps/s/chip ({num_envs} envs, {wind_kind} winds, '
                f'{MODE}, {backend})',
      'value': round(env_steps_per_s, 1),
      'unit': 'env-steps/s',
      'vs_baseline': round(env_steps_per_s / BASELINE_STEPS_PER_S, 1),
  }))


if __name__ == '__main__':
  main()
