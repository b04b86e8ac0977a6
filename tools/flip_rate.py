"""Measures the StationSeeker action-flip rate between bf16 and f32
forecast-grid storage (VERDICT round-2 weakness 3).

For each suite seed, two copies of the SAME world (parity_reset) differing
only in WindFieldState.field dtype run closed loop for 960 steps; the flip
rate is the fraction of steps where the two policies pick different
actions. This quantifies what the bf16 HBM optimization costs a
feature-sensitive rule-based policy (the reference's most numerically
brittle consumer; trained agents see the bf16 features during training
and are self-consistent).

Usage: PYTHONPATH= JAX_PLATFORMS=cpu python tools/flip_rate.py --seeds 10
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from ble_tpu.agents import station_seeker
from ble_tpu.env import env as env_lib
from ble_tpu.env import parity_reset
from ble_tpu.env import wind_gp as wind_gp_lib
from ble_tpu.generative import vae
from ble_tpu.models import loader


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--seeds', type=int, default=10)
  p.add_argument('--steps', type=int, default=960)
  p.add_argument('--out', default='')
  args = p.parse_args()

  params = env_lib.EnvParams()
  decoder_params = loader.load_offlineskies22()
  field_fn = lambda key: vae.sample_field(decoder_params, key)

  def episode_actions(state0, obs0, num_steps):
    """Closed-loop StationSeeker actions, (T,) int32."""
    def body(carry, _):
      state, obs = carry
      a = station_seeker.pick_action(obs)
      out = env_lib.step(params, state, a)
      return (out.state, out.observation), a

    period = wind_gp_lib.REFRESH_PERIOD
    n_chunks = num_steps // period

    def chunk(carry, _):
      state, obs = carry
      state = state.replace(gp=wind_gp_lib.refresh(state.gp))
      return jax.lax.scan(body, (state, obs), None, length=period)

    carry, acts = jax.lax.scan(chunk, (state0, obs0), None, length=n_chunks)
    acts = acts.reshape(-1)
    rem = num_steps - n_chunks * period
    if rem:
      _, tail = jax.lax.scan(body, carry, None, length=rem)
      acts = jnp.concatenate([acts, tail])
    return acts

  run = jax.jit(lambda s, o: episode_actions(s, o, args.steps))

  total = flips = 0
  per_seed = []
  for seed in range(args.seeds):
    s32, o32 = parity_reset.parity_reset(seed, params, field_fn=field_fn,
                                         field_dtype=jnp.float32)
    s16, o16 = parity_reset.parity_reset(seed, params, field_fn=field_fn,
                                         field_dtype=jnp.bfloat16)
    a32 = np.asarray(run(s32, o32))
    a16 = np.asarray(run(s16, o16))
    n = int((a32 != a16).sum())
    per_seed.append({'seed': seed, 'flips': n, 'steps': args.steps,
                     'first_flip': int(np.argmax(a32 != a16)) if n else None})
    flips += n
    total += args.steps
    print(f'seed {seed}: {n}/{args.steps} flips', flush=True)

  rate = flips / total
  summary = {'flip_rate': rate, 'total_flips': flips, 'total_steps': total,
             'per_seed': per_seed}
  print(json.dumps({'flip_rate': rate, 'total_flips': flips,
                    'total_steps': total}))
  if args.out:
    with open(args.out, 'w') as f:
      json.dump(summary, f, indent=2)


if __name__ == '__main__':
  main()
