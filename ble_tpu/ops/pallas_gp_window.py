"""Fused K-step GP observe+query Pallas kernel (the "mega-kernel" core).

The honest env step is bandwidth-floored by the GP inverse: wind_gp's
(CAP, CAP) f32 ``kinv`` is read+written by the observe kernel AND re-read
by the column-query kernel EVERY env step -- ~192 KiB/env-step of
mandatory HBM traffic on a step whose every other stream is a few KiB
(docs/benchmarks.md roofline; the reference's equivalent cost center is
the per-step sklearn GP refit, ``env/wind_gp.py:143-215``).

This kernel erases that floor two ways at once:

  1. **observe+query fusion**: one kernel performs the bordered-inverse
     update AND the 181-level posterior query (reference
     ``env/features.py:457-581``) against the just-updated state, so kinv
     is touched once, in VMEM, per step -- not streamed three times.
  2. **K-step residency**: the grid is ``(env_blocks, K)`` with the GP
     state blocks' index maps CONSTANT along the K axis -- Mosaic's block
     revisiting keeps them VMEM-resident across all K steps of a window
     and DMAs them once per window, while the per-step observation
     blocks stream through double-buffered. kinv traffic amortizes to
     ``128 KiB / K`` per env-step.

The observe algorithm is wind_gp.observe's exact sequence (two window
expiries, ring eviction, bordered insert, with the same exact-arithmetic
pivot clamps), with the pivot chain read off the 4x4 Gram matrix as in
ops/pallas_gp_observe.py -- but the final application uses the SAME
rank-8 outer-product-sum form as the XLA path (wind_gp.observe:250-259):
``kinv' = kinv + (W * c) @ W.T`` as ONE MXU matmul instead of nine
separate VPU passes over the (CAP, CAP) matrix (the measured ~1.4 us of
serial in-kernel compute in the round-4 observe kernel; VERDICT r4
weak 4).

K=1 (``step``) is the production training/eval path: a drop-in
replacement for the observe_batched + query_column kernel pair.
K>1 (``window``) powers the staged window rollout (env.rollout_window):
positions/errors for K steps are produced by the wide physics scan
first, then the GP consumes them with kinv pinned.

tests/test_pallas_gp_window.py pins both entries against the XLA
wind_gp.observe/query pair in interpret mode (and on TPU hardware when
available).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ble_tpu.env import wind_gp

CAP = wind_gp.CAPACITY
NUM_LEVELS = 181
_PREC = jax.lax.Precision.HIGHEST

# Envs per grid program. VMEM per program ~ E_BLK * (2 * 64 KiB kinv
# in+out + ~16 KiB tables) + streamed obs/level double buffers -- E_BLK=8
# stays ~1.5 MiB, far under the ~16 MiB budget, and gives Mosaic 8
# independent per-env chains to interleave.
E_BLK = 8

# Query-level lane-chunk width: the per-env query intermediates are
# (CAP, _LVL_CHUNK) and at 128 lanes each the full unrolled E_BLK body
# stays well inside the 16 MiB scoped-VMEM stack (a single un-chunked
# (CAP, NUM_LEVELS->256-lane-padded) live set x 8 envs overflowed it).
_LVL_CHUNK = 128

# Experimental: run the posterior-VARIANCE matmul (k* @ kinv, the
# kernel's dominant FLOP term now that it is compute-bound — see
# docs/benchmarks.md) with bf16 inputs and f32 accumulation. MEASURED
# NEGATIVE (round 5): max deviation error 0.25 on the clipped-[0,1]
# feature (means stay at 3e-5) — the cancellation in
# sigma^2 - k*^T kinv k* amplifies bf16 mantissa noise, so the cheap
# cast is NOT shippable; a compensated split-precision scheme would be
# needed to harvest this FLOP saving. Kept as an env-gated experiment.
VAR_BF16 = os.environ.get('BLE_GP_VAR_BF16') == '1'

_LS = (357000.0, 357000.0, 326.0, 34560.0)

# Perciatelli query-pressure grid bounds (utils/constants.py; pinned by
# tests against features.PRESSURE_LEVELS).
_PRES_MIN = 5000.0
_PRES_MAX = 14000.0


def _observe_core(x, y, p, t, enabled, loc_in, active, kinv, count):
  """One env's bordered-inverse update on VALUES.

  Identical slot bookkeeping + clamped Gram-chain pivots to
  ops/pallas_gp_observe._env_body; the application is the rank-8 MXU
  form (one (CAP, 8) @ (8, CAP) matmul) -- the same rank-8
  outer-product-sum the XLA path applies (wind_gp.observe:250-259), so
  its numerics are the proven ones.

  Returns (locations, active_final, kinv_new, slot_mask, count_new).
  """
  iota = jax.lax.broadcasted_iota(jnp.int32, (CAP,), 0)
  iota_f = iota.astype(jnp.float32)

  stale = jnp.logical_and(active > 0.5,
                          (t - loc_in[:, 3]) >= wind_gp.TIME_HORIZON_S)
  first1 = jnp.min(jnp.where(stale, iota_f, jnp.float32(CAP)))
  e1 = (iota_f == first1).astype(jnp.float32)
  stale2 = jnp.logical_and(stale, e1 < 0.5)
  first2 = jnp.min(jnp.where(stale2, iota_f, jnp.float32(CAP)))
  e2 = (iota_f == first2).astype(jnp.float32)

  slot = count % CAP
  slot_e = (iota == slot).astype(jnp.float32)
  removed12 = jnp.logical_or(e1 > 0.5, e2 > 0.5)
  active_after_rm = jnp.where(removed12, 0.0, active)
  slot_active = jnp.sum(slot_e * active_after_rm) > 0.5
  eo = jnp.where(slot_active, slot_e, 0.0)
  active_pre_insert = jnp.where(eo > 0.5, 0.0, active_after_rm)
  active_final = jnp.maximum(active_pre_insert, slot_e)

  sm = slot_e[:, None]
  new_row = jnp.stack([x, y, p, t])[None, :]
  locations = loc_in * (1.0 - sm) + sm * new_row

  lsx, lsy, lsp, lst = _LS
  dx = (x - loc_in[:, 0]) / lsx
  dy = (y - loc_in[:, 1]) / lsy
  dp = (p - loc_in[:, 2]) / lsp
  dt = (t - loc_in[:, 3]) / lst
  d = jnp.sqrt(dx * dx + dy * dy + dp * dp + dt * dt + 1e-12)
  v = (wind_gp.SIGMA_EXP_SQUARED * jnp.exp(-d)) * active_pre_insert

  d0 = wind_gp.SIGMA_EXP_SQUARED + wind_gp.SIGMA_NOISE_SQUARED

  # Gram-chain pivots (see pallas_gp_observe._env_body for the full
  # derivation): t[l][j] and d_j read off s = U^T K0 U via block-LDL
  # recurrences, clamped exactly like the XLA path.
  u_mat = jnp.stack([e1, e2, eo, v], axis=1)  # (CAP, 4)
  m_mat = jnp.dot(kinv, u_mat, preferred_element_type=jnp.float32,
                  precision=_PREC)  # (CAP, 4)
  s_mat = jnp.dot(u_mat.T, m_mat, preferred_element_type=jnp.float32,
                  precision=_PREC)  # (4, 4)

  removing = [jnp.sum(e1) > 0.5, jnp.sum(e2) > 0.5, jnp.sum(eo) > 0.5]
  d_min = 1.0 / d0
  tc = {}
  safe = []
  for j in range(3):
    dj = s_mat[j, j]
    for q in range(j):
      tc[(q, j)] = s_mat[j, q] - sum(
          (tc[(r, q)] / safe[r]) * tc[(r, j)] for r in range(q))
      dj = dj - tc[(q, j)] * tc[(q, j)] / safe[q]
    safe.append(jnp.where(jnp.abs(dj) > d_min, dj,
                          jnp.where(removing[j], d_min, 1.0)))
  for q in range(3):
    tc[(q, 3)] = s_mat[3, q] - sum(
        (tc[(r, q)] / safe[r]) * tc[(r, 3)] for r in range(q))
  d_v = s_mat[3, 3] - sum(tc[(q, 3)] * tc[(q, 3)] / safe[q]
                          for q in range(3))
  schur = jnp.maximum(d0 - d_v, wind_gp.SIGMA_NOISE_SQUARED)

  # Update vectors in real space (<=6 AXPYs on (CAP, 1) columns).
  w = []
  for j in range(4):
    wj = m_mat[:, j:j + 1]
    for q in range(j):
      wj = wj - (tc[(q, j)] / safe[q]) * w[q]
    w.append(wj)
  yv = w[3] - slot_e[:, None]

  # Rank-8 application as ONE MXU matmul: kinv' = kinv + (W * c) @ W.T.
  # Same eight terms as the explicit outer-product sum (and as the XLA
  # path's w_mat/c_vec form); zero one-hot columns of skipped
  # modifications contribute exactly nothing.
  w_mat = jnp.concatenate(
      [w[0], w[1], w[2], e1[:, None], e2[:, None], eo[:, None], yv,
       slot_e[:, None]], axis=1)  # (CAP, 8)
  c_vec = jnp.stack([-1.0 / safe[0], -1.0 / safe[1], -1.0 / safe[2],
                     jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0),
                     1.0 / schur, jnp.float32(-1.0)])
  kinv_new = kinv + jnp.dot(w_mat * c_vec[None, :], w_mat.T,
                            preferred_element_type=jnp.float32,
                            precision=_PREC)

  return (locations, active_final, kinv_new, sm,
          jnp.where(enabled, count + 1, count))


def _step_one(obs_row, pres_row, loc_in, err_in, active, kinv, alpha_in,
              count):
  """One env, one step: observe then query. All VALUES.

  obs_row (8,): [x, y, p, t, err_u, err_v, enabled, pad].
  pres_row (1, NUM_LEVELS): query pressures as a lane-major ROW.
  Returns (loc, err, active, kinv, alpha, count,
  level_chunks: list of (3, chunk) lane-blocks covering NUM_LEVELS).

  Mosaic layout constraints (found by compile bisection on v5e, see
  docs/benchmarks.md): the level axis must live on LANES, results are
  assembled by SUBLANE concat into (3, chunk) rows, and the query runs
  in <=128-lane chunks -- the original (NUM_LEVELS, 3) column layout hit
  a tpu.concatenate internal error on (181, 1) vpad columns, and keeping
  8 envs' (181, 128) intermediates live overflowed the 16 MiB scoped
  VMEM stack.
  """
  x, y, p, t = obs_row[0], obs_row[1], obs_row[2], obs_row[3]
  eu, ev = obs_row[4], obs_row[5]
  enabled = obs_row[6] > 0.5

  loc_mid, active_final, kinv_new, sm, count_new = _observe_core(
      x, y, p, t, enabled, loc_in, active, kinv, count)

  # Error-row insert + exact alpha from the new inverse (one MXU matmul).
  err_new = jnp.stack([eu, ev])[None, :]
  errors = err_in * (1.0 - sm) + sm * err_new
  targets = errors * active_final[:, None]
  alpha = jnp.dot(kinv_new, targets, preferred_element_type=jnp.float32,
                  precision=_PREC)

  # enabled=False -> exact no-op (frozen post-terminal balloons;
  # wind_gp.observe docstring).
  loc = jnp.where(enabled, loc_mid, loc_in)
  err = jnp.where(enabled, errors, err_in)
  act = jnp.where(enabled, active_final, active)
  kv = jnp.where(enabled, kinv_new, kinv)
  al = jnp.where(enabled, alpha, alpha_in)

  # --- Query the UPDATED state at this step's (x, y, t) over the level
  # column (matches env._observe_and_features: features see the
  # post-observe GP). Transposed orientation: levels on LANES, in
  # <=128-lane chunks (see docstring).
  lsx, lsy, lsp, lst = _LS
  qdx = (x - loc[:, 0]) / lsx
  qdy = (y - loc[:, 1]) / lsy
  qdt = (t - loc[:, 3]) / lst
  qc = (qdx * qdx + qdy * qdy + qdt * qdt + 1e-12)[:, None]  # (CAP, 1)
  any_valid = (jnp.max(act) > 0.0).astype(jnp.float32)

  level_chunks = []
  for c0 in range(0, NUM_LEVELS, _LVL_CHUNK):
    c1 = min(c0 + _LVL_CHUNK, NUM_LEVELS)
    pres_c = pres_row[:, c0:c1]  # (1, chunk)
    qdp = (pres_c - loc[:, 2][:, None]) / lsp  # (CAP, chunk)
    qd = jnp.sqrt(qc + qdp * qdp)
    k_star = (wind_gp.SIGMA_EXP_SQUARED * jnp.exp(-qd)) * act[:, None]
    # means^T (2, chunk): contract CAP without an explicit transpose.
    means = jax.lax.dot_general(
        al, k_star, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PREC)
    # vv (CAP, chunk) = kinv @ k_star (kinv symmetric).
    if VAR_BF16:
      vv = jnp.dot(kv.astype(jnp.bfloat16), k_star.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    else:
      vv = jnp.dot(kv, k_star, preferred_element_type=jnp.float32,
                   precision=_PREC)
    var = wind_gp.SIGMA_EXP_SQUARED - jnp.sum(k_star * vv, axis=0,
                                              keepdims=True)  # (1, chunk)
    dev = jnp.clip(var / wind_gp.SIGMA_EXP_SQUARED, 0.0, 1.0)
    level_chunks.append(
        jnp.concatenate([means * any_valid, dev * any_valid], axis=0))

  return loc, err, act, kv, al, count_new, level_chunks


def _kernel(obs_ref, pres_ref, loc_in, err_in, act_in, kinv_in, alpha_in,
            cnt_in,
            loc_o, err_o, act_o, kinv_o, alpha_o, cnt_o, lvl_o):
  """Grid (env_blocks, K). GP-state blocks are constant along K (Mosaic
  keeps them resident and DMAs once per window); obs/level stream.

  The output refs double as the cross-step carry (flash-attention-style
  accumulator): k==0 copies the inputs in, every step updates in place.
  """
  k = pl.program_id(1)

  @pl.when(k == 0)
  def _():
    loc_o[...] = loc_in[...]
    err_o[...] = err_in[...]
    act_o[...] = act_in[...]
    kinv_o[...] = kinv_in[...]
    alpha_o[...] = alpha_in[...]
    cnt_o[...] = cnt_in[...]

  counts = []
  for e in range(E_BLK):
    loc, err, act, kv, al, cnt, level_chunks = _step_one(
        obs_ref[0, e, :], pres_ref, loc_o[e], err_o[e], act_o[e, :],
        kinv_o[e], alpha_o[e], cnt_o[e, 0])
    loc_o[e] = loc
    err_o[e] = err
    act_o[e, :] = act
    kinv_o[e] = kv
    alpha_o[e] = al
    # Per-chunk stores at lane offsets 0, 128, ... (static, aligned).
    for ci, c0 in enumerate(range(0, NUM_LEVELS, _LVL_CHUNK)):
      c1 = min(c0 + _LVL_CHUNK, NUM_LEVELS)
      lvl_o[0, e, :, c0:c1] = level_chunks[ci]
    counts.append(cnt)
  cnt_o[...] = jnp.stack(counts).reshape(E_BLK, 1)


@functools.partial(jax.jit, static_argnames=('interpret',))
def window(state: wind_gp.WindGPState, obs_seq, interpret: bool = None):
  """K steps of fused observe+query with kinv VMEM-resident.

  Args:
    state: batched WindGPState (leaves lead with (E,)); E must be a
      multiple of E_BLK (the callers' batch sizes are powers of two).
    obs_seq: (K, E, 8) f32 packed [x, y, p, t, err_u, err_v, enabled, 0]
      per step per env (see pallas_gp_observe._pack_obs).
    interpret: Pallas interpreter (None = "not on TPU").

  Returns:
    (new_state, level (K, E, NUM_LEVELS, 3) [mean_u, mean_v, deviation]).
  """
  if interpret is None:
    interpret = jax.default_backend() != 'tpu'
  kk, n = obs_seq.shape[0], obs_seq.shape[1]
  if n % E_BLK:
    raise ValueError(f'num envs {n} must be a multiple of {E_BLK}')
  pres = jnp.asarray(
      jnp.linspace(_PRES_MIN, _PRES_MAX, NUM_LEVELS), jnp.float32)[None, :]

  grid = (n // E_BLK, kk)

  def const_spec(shape):  # GP state: resident across the K axis.
    return pl.BlockSpec((E_BLK,) + shape, lambda i, k: (i,) + (0,) * len(shape),
                        memory_space=pltpu.VMEM)

  in_specs = [
      pl.BlockSpec((1, E_BLK, 8), lambda i, k: (k, i, 0),
                   memory_space=pltpu.VMEM),            # obs (streams)
      pl.BlockSpec((1, NUM_LEVELS), lambda i, k: (0, 0),
                   memory_space=pltpu.VMEM),            # pressures (row)
      const_spec((CAP, 4)), const_spec((CAP, 2)), const_spec((CAP,)),
      const_spec((CAP, CAP)), const_spec((CAP, 2)), const_spec((1,)),
  ]
  out_specs = [
      const_spec((CAP, 4)), const_spec((CAP, 2)), const_spec((CAP,)),
      const_spec((CAP, CAP)), const_spec((CAP, 2)), const_spec((1,)),
      pl.BlockSpec((1, E_BLK, 3, NUM_LEVELS), lambda i, k: (k, i, 0, 0),
                   memory_space=pltpu.VMEM),            # level^T (streams)
  ]
  out_shapes = (
      jax.ShapeDtypeStruct((n, CAP, 4), jnp.float32),
      jax.ShapeDtypeStruct((n, CAP, 2), jnp.float32),
      jax.ShapeDtypeStruct((n, CAP), jnp.float32),
      jax.ShapeDtypeStruct((n, CAP, CAP), jnp.float32),
      jax.ShapeDtypeStruct((n, CAP, 2), jnp.float32),
      jax.ShapeDtypeStruct((n, 1), jnp.int32),
      jax.ShapeDtypeStruct((kk, n, 3, NUM_LEVELS), jnp.float32),
  )
  compiler_params = None
  if not interpret:
    mk = getattr(pltpu, 'CompilerParams',
                 getattr(pltpu, 'TPUCompilerParams', lambda **kw: None))
    compiler_params = mk(dimension_semantics=('parallel', 'arbitrary'))

  loc, err, active, kinv, alpha, count, level = pl.pallas_call(
      _kernel,
      grid=grid,
      in_specs=in_specs,
      out_specs=out_specs,
      out_shape=out_shapes,
      interpret=interpret,
      compiler_params=compiler_params,
  )(obs_seq, pres, state.locations, state.errors,
    state.active.astype(jnp.float32), state.kinv, state.alpha,
    state.count.reshape(n, 1))
  new_state = wind_gp.WindGPState(
      locations=loc, errors=err, active=active > 0.5, kinv=kinv,
      alpha=alpha, count=count[:, 0])
  # Kernel emits level^T (K, E, 3, NUM_LEVELS); callers keep the original
  # (K, E, NUM_LEVELS, 3) convention -- one tiny XLA transpose outside.
  return new_state, jnp.swapaxes(level, 2, 3)


def step(state: wind_gp.WindGPState, x_m, y_m, pressure_pa, elapsed_s,
         error_u, error_v, enabled=True, interpret: bool = None):
  """K=1 fused observe+query: the production per-step path.

  Drop-in replacement for the (observe_batched, query_column) kernel
  pair in env._post_physics_batched: kinv is read+written ONCE instead
  of read twice + written once.

  Returns (new_state, means (E, NUM_LEVELS, 2), deviations
  (E, NUM_LEVELS)).
  """
  from ble_tpu.ops import pallas_gp_observe
  n = state.kinv.shape[0]
  bc = lambda v: jnp.broadcast_to(jnp.asarray(v, jnp.float32), (n,))
  obs = pallas_gp_observe._pack_obs(
      bc(x_m), bc(y_m), bc(pressure_pa), bc(elapsed_s), bc(error_u),
      bc(error_v), jnp.broadcast_to(jnp.asarray(enabled), (n,)))
  new_state, level = window(state, obs[None], interpret=interpret)
  return new_state, level[0, :, :, 0:2], level[0, :, :, 2]
