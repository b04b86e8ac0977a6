"""Per-stage timing of the batched env step: physics vs wind lookup vs GP
observe vs GP query/features.

Times each stage in isolation with a scan of STEPS iterations over a live
batch (same methodology as bench.py: long scans returning scalars, so the
remote-TPU tunnel's output download is amortized away).

  python -m examples.profile_step --num_envs 4096 --steps 32
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp

from ble_tpu.env import env as env_lib
from ble_tpu.env import features as features_lib
from ble_tpu.env import wind_field as wind_field_lib
from ble_tpu.env import wind_gp
from ble_tpu.generative import vae


def timed(fn, *args, reps=3):
  """Times fn via a FORCED host fetch of its scalar result:
  block_until_ready does not synchronize through the remote-TPU tunnel
  (docs/benchmarks.md round-4 calibration)."""
  float(jnp.asarray(fn(*args)).ravel()[0])
  times = []
  for _ in range(reps):
    t0 = time.perf_counter()
    float(jnp.asarray(fn(*args)).ravel()[0])
    times.append(time.perf_counter() - t0)
  return min(times)


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--num_envs', type=int, default=4096)
  p.add_argument('--steps', type=int, default=32)
  p.add_argument('--wind', type=str, default='generative')
  args = p.parse_args()
  n, steps = args.num_envs, args.steps

  env_params = env_lib.EnvParams()
  if args.wind == 'generative':
    field_fn = env_lib.make_field_fn(
        'generative', vae.init_decoder_params(jax.random.PRNGKey(0)))
  else:
    field_fn = env_lib.make_field_fn('static')

  reset_b = jax.jit(jax.vmap(functools.partial(
      env_lib.reset, params=env_params, field_fn=field_fn)))
  keys = jax.random.split(jax.random.PRNGKey(42), n)
  parts = [reset_b(keys[i:i + 512]) for i in range(0, n, 512)]
  state = jax.tree.map(lambda *xs: jnp.concatenate(xs), *[s[0] for s in parts])
  jax.block_until_ready(state)

  def scan_stage(body):
    """Scans `body` over a (state, key) carry and returns one scalar."""
    def run(state, key):
      def f(carry, i):
        st, acc = body(carry[0], jax.random.fold_in(key, i), carry[1])
        return (st, acc), ()
      (state, acc), _ = jax.lax.scan(f, (state, jnp.float32(0.0)),
                                     jnp.arange(steps))
      return acc
    return jax.jit(run)

  # 1. Full step. The observation MUST be consumed or XLA dead-code
  # eliminates the GP + feature pipeline (reward only reads the balloon
  # position) -- the round-1..3 bench measured that hollow step.
  def full_body(st, key, acc):
    actions = jax.random.randint(key, (n,), 0, 3)
    out = env_lib.step_batched(env_params, st, actions)
    return out.state, acc + out.reward.mean() + 1e-12 * jnp.sum(
        out.observation)
  t_full = timed(scan_stage(full_body), state, jax.random.PRNGKey(0))

  # 2. Physics only (fused kernel + state replace; no wind/GP/features).
  def phys_body(st, key, acc):
    actions = jax.random.randint(key, (n,), 0, 3)
    if jax.default_backend() == 'tpu':
      from ble_tpu.ops import pallas_physics
      b = pallas_physics.simulate_step_fused(
          env_params.balloon, st.atmosphere, st.balloon, st.wind_u,
          st.wind_v, actions)
    else:
      import functools as ft
      b = jax.vmap(lambda a, bb, u, v, act: __import__(
          'ble_tpu.env.balloon', fromlist=['x']).simulate_step(
              env_params.balloon, a, bb, u, v, act))(
                  st.atmosphere, st.balloon, st.wind_u, st.wind_v, actions)
    return st.replace(balloon=b), acc + b.pressure_pa.mean()

  t_phys = timed(scan_stage(phys_body), state, jax.random.PRNGKey(0))

  # 3. Wind ground-truth lookup (4-D interp + simplex noise).
  def wind_body(st, key, acc):
    u, v = jax.vmap(wind_field_lib.get_ground_truth)(
        st.wind, st.balloon.x_m + acc, st.balloon.y_m,
        st.balloon.pressure_pa, st.balloon.time_elapsed_s.astype(jnp.float32))
    return st, acc + u.mean() + v.mean()
  t_wind = timed(scan_stage(wind_body), state, jax.random.PRNGKey(0))

  # 4. GP observe (incremental inverse update; the blocked kernel on TPU,
  # exactly as _post_physics_batched runs it).
  def gp_obs_body(st, key, acc):
    if jax.default_backend() == 'tpu':
      from ble_tpu.ops import pallas_gp_observe
      gp = pallas_gp_observe.observe_batched(
          st.gp, st.balloon.x_m + acc, st.balloon.y_m,
          st.balloon.pressure_pa,
          st.balloon.time_elapsed_s.astype(jnp.float32) + acc,
          jnp.full((n,), 1.0), jnp.full((n,), -1.0))
    else:
      gp = jax.vmap(wind_gp.observe)(
          st.gp, st.balloon.x_m + acc, st.balloon.y_m,
          st.balloon.pressure_pa,
          st.balloon.time_elapsed_s.astype(jnp.float32) + acc,
          jnp.full((n,), 1.0), jnp.full((n,), -1.0))
    return st.replace(gp=gp), acc + gp.alpha.sum() * 0.0 + 1.0
  t_gp_obs = timed(scan_stage(gp_obs_body), state, jax.random.PRNGKey(0))

  # 5. Features (GP query over 181 levels + pressure range + ambient).
  def feat_body(st, key, acc):
    obs = jax.vmap(functools.partial(features_lib.get_features,
                                     env_params.balloon))(
        st.balloon, st.gp, st.wind, st.atmosphere, st.sunrise_s, st.sunset_s)
    return st, acc + obs.mean()
  t_feat = timed(scan_stage(feat_body), state, jax.random.PRNGKey(0))

  # 6. Forecast-only lookup (no noise): the second wind read of the step.
  def forecast_body(st, key, acc):
    u, v = jax.vmap(wind_field_lib.get_forecast)(
        st.wind, st.balloon.x_m + acc, st.balloon.y_m,
        st.balloon.pressure_pa, st.balloon.time_elapsed_s.astype(jnp.float32))
    return st, acc + u.mean() + v.mean()
  t_forecast = timed(scan_stage(forecast_body), state, jax.random.PRNGKey(0))

  # 7. Simplex noise alone (10 harmonics x OpenSimplex lattice sums).
  def noise_body(st, key, acc):
    u, v = jax.vmap(wind_field_lib.get_noise)(
        st.wind, st.balloon.x_m + acc, st.balloon.y_m,
        st.balloon.pressure_pa, st.balloon.time_elapsed_s.astype(jnp.float32))
    return st, acc + u.mean() + v.mean()
  t_noise = timed(scan_stage(noise_body), state, jax.random.PRNGKey(0))

  # --- Round-5 stages: the fused-step decomposition (VERDICT r4 next-3:
  # name >=90% of the honest step).

  # 8. Scan/launch floor: a body that touches the carry trivially.
  def empty_body(st, key, acc):
    return st, acc + st.balloon.x_m.mean() * 1e-30 + 1.0
  t_empty = timed(scan_stage(empty_body), state, jax.random.PRNGKey(0))

  # 9. The single (10, 2) effective column (what the fused step actually
  # contracts; serves both wind lookups).
  def col_body(st, key, acc):
    col = jax.vmap(wind_field_lib.effective_column)(
        st.wind, st.balloon.x_m + acc, st.balloon.y_m,
        st.balloon.time_elapsed_s.astype(jnp.float32))
    return st, acc + col.mean()
  t_col = timed(scan_stage(col_body), state, jax.random.PRNGKey(0))

  # 10. Fused GP observe+query (K=1 production kernel).
  def gp_step_body(st, key, acc):
    from ble_tpu.ops import pallas_gp_window
    gp, means, dev = pallas_gp_window.step(
        st.gp, st.balloon.x_m + acc, st.balloon.y_m,
        st.balloon.pressure_pa,
        st.balloon.time_elapsed_s.astype(jnp.float32) + acc,
        jnp.full((n,), 1.0), jnp.full((n,), -1.0))
    return st.replace(gp=gp), acc + means.mean() * 1e-12 + dev.mean() * 0.0 + 1.0
  t_gp_step = timed(scan_stage(gp_step_body), state, jax.random.PRNGKey(0))

  # 11. Feature assembly from a PRECOMPUTED query (ambient + centered
  # gather + pressure range; no GP, no field read).
  means0 = jnp.zeros((n, features_lib.NUM_PRESSURE_LEVELS, 2))
  dev0 = jnp.zeros((n, features_lib.NUM_PRESSURE_LEVELS))
  fc0 = jnp.zeros((n, features_lib.NUM_PRESSURE_LEVELS, 2))

  def feat_pre_body(st, key, acc):
    obs = jax.vmap(functools.partial(features_lib.get_features_precomputed,
                                     env_params.balloon))(
        st.balloon, st.atmosphere, st.sunrise_s, st.sunset_s,
        means0 + acc, dev0, fc0)
    return st, acc + obs.mean() * 1e-12 + 1e-9
  t_feat_pre = timed(scan_stage(feat_pre_body), state, jax.random.PRNGKey(0))

  # 12. Step epilogue: reward + info dict + done + sunrise advance + the
  # post-physics state replaces (everything elementwise around the
  # kernels).
  def epilogue_body(st, key, acc):
    from ble_tpu.env import balloon as balloon_lib
    b = st.balloon
    st2 = st.replace(
        balloon=b, wind_u=st.wind_u + acc * 1e-30, wind_v=st.wind_v,
        sunrise_s=env_lib._advance_past(st.sunrise_s, b.time_s),
        sunset_s=env_lib._advance_past(st.sunset_s, b.time_s),
        steps=st.steps + 1)
    excess = balloon_lib.excess_energy(env_params.balloon, b)
    reward = env_lib.reward_function(env_params, b, excess)
    soc = balloon_lib.battery_soc(env_params.balloon, b)
    done = b.status != 0
    return st2, (acc + reward.mean() + soc.mean() * 1e-12 +
                 done.sum() * 1e-12)
  t_epi = timed(scan_stage(epilogue_body), state, jax.random.PRNGKey(0))

  # 13. The staged window rollout (K = cache cadence), the bench's
  # default mode.
  kw = env_params.field_cache_every

  def window_run(st, key):
    def chunk(carry, i):
      ks = jax.random.fold_in(key, i)
      actions = jax.vmap(lambda kk: jax.random.randint(
          jax.random.fold_in(ks, kk), (n,), 0, 3))(jnp.arange(kw))
      out = env_lib.rollout_window(env_params, carry, actions)
      return out.state, (out.reward.mean() +
                         1e-12 * jnp.sum(out.observation))
    st, accs = jax.lax.scan(chunk, st, jnp.arange(steps // kw))
    return accs.sum()
  t_window = timed(jax.jit(window_run), state, jax.random.PRNGKey(0))

  unit = 1e6 / (n * steps)  # -> us per env-step.
  print(f'num_envs={n} steps={steps} backend={jax.default_backend()}')
  rows = [('full step', t_full),
          ('window rollout K=%d' % kw, t_window),
          ('physics (fused)', t_phys),
          ('wind gt lookup', t_wind), ('gp observe (old)', t_gp_obs),
          ('features+gp query', t_feat), ('forecast lookup', t_forecast),
          ('noise only', t_noise),
          ('scan/launch floor', t_empty),
          ('effective column', t_col),
          ('gp fused obs+query', t_gp_step),
          ('features precomp', t_feat_pre),
          ('step epilogue', t_epi)]
  for name, t in rows:
    print(f'{name:22s} {t*1e3:8.1f} ms total   {t*unit:8.4f} us/env-step   '
          f'{n*steps/t/1e6:6.2f} M env-steps/s')
  parts = t_phys + t_col + t_noise + t_gp_step + t_feat_pre + t_epi
  print(f'{"sum of fused stages":22s} {parts*1e3:8.1f} ms total   '
        f'{parts*unit:8.4f} us/env-step   (physics + column + noise + '
        f'gp-fused + features + epilogue)')
  print(f'{"unattributed":22s} {(t_full-parts)*1e3:8.1f} ms total   '
        f'{(t_full-parts)*unit:8.4f} us/env-step   (full - fused stages)')


if __name__ == '__main__':
  main()
