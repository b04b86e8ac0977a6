"""Fused Pallas TPU kernel for the GP observe (bordered-inverse update).

The per-stage profile (docs/benchmarks.md, round 4) showed wind_gp.observe
is the env step's dominant stage once measurement artifacts are removed:
under XLA its five (CAP, .)-shaped matmuls + the rank-8 update materialize
the (128, 128) inverse several times per env per step, and the tiny minor
dimensions (5, 8, 9) pad catastrophically under vmap. The whole working
set is only 64 KiB/env, so this kernel loads kinv into VMEM ONCE, runs the
complete update (expiries, ring eviction, bordered insert, alpha) there,
and writes kinv' back: HBM traffic drops to one read + one write of kinv
plus the small tables.

Applies the SAME sequential clamped rank-1 updates as
ble_tpu/env/wind_gp.observe, in the same order -- but DIRECTLY on the
VMEM-resident inverse (the XLA path's 9-dimensional basis bookkeeping
exists only to batch those updates into few HBM-streamed matmuls, which
is pointless in VMEM and costs ~50 tiny lane-relayout ops).

The production entry is `observe_batched`: E_BLK envs per grid program --
a measured pass-through kernel with this I/O signature costs ~1.9
us/env-step at one env per program (13 small DMA setups x one program
per env), so the batch is blocked and Mosaic's grid pipelining overlaps
the block DMAs with compute.

tests/test_pallas_gp_observe.py pins f32-tolerance agreement against the
XLA path in interpret mode and on hardware, for both entries.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ble_tpu.env import wind_gp

CAP = wind_gp.CAPACITY
_PREC = jax.lax.Precision.HIGHEST

# Envs per grid program (amortizes per-program DMA setup; VMEM per
# program = E_BLK * ~136 KiB * in+out, far under the ~16 MiB budget).
E_BLK = 8


def _env_body(x, y, p, t, enabled, loc_in, err_in, active, kinv, alpha_in,
              count):
  """One env's complete observe on VALUES (refs are sliced by callers).

  Returns (locations, errors, active_final, kinv_new, alpha, count_new),
  each already select-guarded by `enabled`.
  """
  iota = jax.lax.broadcasted_iota(jnp.int32, (CAP,), 0)

  # --- Slot bookkeeping (wind_gp.observe: stale expiry, ring slot).
  # First-stale-index via f32 min-reduction (Mosaic's argmax lowering is
  # f32-only and its tie rule is not guaranteed; min(where(stale, i, CAP))
  # is branchless and picks the lowest index exactly like jnp.argmax on a
  # bool mask). No stale slot -> index CAP -> the one-hot is all zero.
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

  # Branchless row replacement at `slot` (dynamic_update_slice
  # equivalent; the error row is inserted by _finish).
  sm = slot_e[:, None]
  new_row = jnp.stack([x, y, p, t])[None, :]
  locations = loc_in * (1.0 - sm) + sm * new_row

  # --- New kernel column vs the post-removal active set.
  lsx, lsy, lsp, lst = (357000.0, 357000.0, 326.0, 34560.0)
  dx = (x - loc_in[:, 0]) / lsx
  dy = (y - loc_in[:, 1]) / lsy
  dp = (p - loc_in[:, 2]) / lsp
  dt = (t - loc_in[:, 3]) / lst
  d = jnp.sqrt(dx * dx + dy * dy + dp * dp + dt * dt + 1e-12)
  v = (wind_gp.SIGMA_EXP_SQUARED * jnp.exp(-d)) * active_pre_insert

  d0 = wind_gp.SIGMA_EXP_SQUARED + wind_gp.SIGMA_NOISE_SQUARED

  # --- The SAME sequential clamped rank-1 updates (remove e1, remove
  # e2, remove eo, insert v), but with every pivot and cross term read
  # off ONE 4x4 Gram matrix s = U^T K0 U instead of re-contracting the
  # running matrix per update: 2 MXU matmuls + ~25 scalar-unit ops
  # replace 4 serial matcol reductions + 4 serial MXU vector dots. The
  # recurrences are the textbook block-LDL ones; identity-restore terms
  # (e_l e_l^T) contribute nothing to later pivots because the four
  # update slots are distinct and v is masked to the active set.
  #   t[l][j] = w_l . u_j = s[j, l] - sum_{p<l} (t[p][l]/safe_p) t[p][j]
  #   d_j     = s[j, j] - sum_{p<j} t[p][j]^2 / safe_p
  u_mat = jnp.stack([e1, e2, eo, v], axis=1)  # (CAP, 4)
  m_mat = jnp.dot(kinv, u_mat, preferred_element_type=jnp.float32,
                  precision=_PREC)  # (CAP, 4) = K0 U
  s_mat = jnp.dot(u_mat.T, m_mat, preferred_element_type=jnp.float32,
                  precision=_PREC)  # (4, 4)

  removing = [jnp.sum(e1) > 0.5, jnp.sum(e2) > 0.5, jnp.sum(eo) > 0.5]
  d_min = 1.0 / d0
  t = {}
  safe = []
  for j in range(3):  # Removal pivots, clamped like `remove` did.
    dj = s_mat[j, j]
    for p in range(j):
      t[(p, j)] = s_mat[j, p] - sum(
          (t[(q, p)] / safe[q]) * t[(q, j)] for q in range(p))
      dj = dj - t[(p, j)] * t[(p, j)] / safe[p]
    safe.append(jnp.where(jnp.abs(dj) > d_min, dj,
                          jnp.where(removing[j], d_min, 1.0)))
  for p in range(3):  # Cross terms into the insert column.
    t[(p, 3)] = s_mat[3, p] - sum(
        (t[(q, p)] / safe[q]) * t[(q, 3)] for q in range(p))
  d_v = s_mat[3, 3] - sum(t[(p, 3)] * t[(p, 3)] / safe[p]
                          for p in range(3))
  # Exact Schur >= sigma_noise^2 (posterior variance at an observed
  # point cannot fall below the noise floor).
  schur = jnp.maximum(d0 - d_v, wind_gp.SIGMA_NOISE_SQUARED)

  # Update vectors (w_j = running-matrix column), reconstructed with
  # <=6 AXPYs on (CAP, 1) columns; zero one-hots make skipped
  # modifications exact no-ops with no masking.
  w = []
  for j in range(4):
    wj = m_mat[:, j:j + 1]
    for p in range(j):
      wj = wj - (t[(p, j)] / safe[p]) * w[p]
    w.append(wj)
  yv = w[3] - slot_e[:, None]

  kinv_new = (kinv
              - (1.0 / safe[0]) * (w[0] * w[0].T)
              - (1.0 / safe[1]) * (w[1] * w[1].T)
              - (1.0 / safe[2]) * (w[2] * w[2].T)
              + e1[:, None] * e1[None, :]
              + e2[:, None] * e2[None, :]
              + eo[:, None] * eo[None, :]
              + (1.0 / schur) * (yv * yv.T)
              - slot_e[:, None] * slot_e[None, :])

  return (locations, active_final, kinv_new, sm,
          jnp.where(enabled, count + 1, count))


def _finish(enabled, eu, ev, sm, active_final, err_mid, kinv_new,
            loc_mid, loc_in, err_in, active, kinv, alpha_in):
  """Error-row insert + alpha + enabled-select (shared by both kernels)."""
  err_new = jnp.stack([eu, ev])[None, :]
  errors = err_mid * (1.0 - sm) + sm * err_new
  targets = errors * active_final[:, None]
  # alpha recomputed exactly from the new inverse (one MXU matmul;
  # Mosaic's gather rule cannot lower the lane-broadcast form).
  alpha = jnp.dot(kinv_new, targets, preferred_element_type=jnp.float32,
                  precision=_PREC)
  # enabled=False -> exact no-op (frozen post-terminal balloons).
  return (jnp.where(enabled, loc_mid, loc_in),
          jnp.where(enabled, errors, err_in),
          jnp.where(enabled, active_final, active),
          jnp.where(enabled, kinv_new, kinv),
          jnp.where(enabled, alpha, alpha_in))


def _run_one(obs_row, loc_in, err_in, active, kinv, alpha_in, count):
  """obs_row (8,): [x, y, p, t, err_u, err_v, enabled, pad]."""
  x, y, p, t = obs_row[0], obs_row[1], obs_row[2], obs_row[3]
  eu, ev = obs_row[4], obs_row[5]
  enabled = obs_row[6] > 0.5
  (loc_mid, active_final, kinv_new, sm,
   count_new) = _env_body(x, y, p, t, enabled, loc_in, err_in, active,
                          kinv, alpha_in, count)
  loc, err, act, kv, al = _finish(enabled, eu, ev, sm, active_final,
                                  err_in, kinv_new, loc_mid, loc_in,
                                  err_in, active, kinv, alpha_in)
  return loc, err, act, kv, al, count_new


def _kernel(obs_ref, loc_ref, err_ref, active_ref, kinv_ref, alpha_ref,
            count_ref,
            loc_out, err_out, active_out, kinv_out, alpha_out, count_out):
  """Single-env kernel (vmap adds the env grid dimension).

  Refs: obs (1, 8); loc (CAP, 4); err (CAP, 2); active (1, CAP) f32 0/1;
  kinv (CAP, CAP); alpha (CAP, 2); count (1, 1) i32.
  """
  loc, err, act, kv, al, count_new = _run_one(
      obs_ref[0, :], loc_ref[:, :], err_ref[:, :], active_ref[0, :],
      kinv_ref[:, :], alpha_ref[:, :], count_ref[0, 0])
  loc_out[:, :] = loc
  err_out[:, :] = err
  active_out[0, :] = act
  kinv_out[:, :] = kv
  alpha_out[:, :] = al
  # (1, 1)-shaped store: Mosaic cannot store scalars to VMEM.
  count_out[:, :] = count_new.reshape(1, 1)


def _kernel_blocked(obs_ref, loc_ref, err_ref, active_ref, kinv_ref,
                    alpha_ref, count_ref,
                    loc_out, err_out, active_out, kinv_out, alpha_out,
                    count_out):
  """E_BLK envs per program; statically unrolled so Mosaic can
  interleave the independent per-env chains.

  Refs: obs (E_BLK, 8); loc (E_BLK, CAP, 4); err (E_BLK, CAP, 2);
  active (E_BLK, CAP); kinv (E_BLK, CAP, CAP); alpha (E_BLK, CAP, 2);
  count (E_BLK, 1) i32.
  """
  counts = []
  for e in range(E_BLK):
    loc, err, act, kv, al, count_new = _run_one(
        obs_ref[e, :], loc_ref[e], err_ref[e], active_ref[e, :],
        kinv_ref[e], alpha_ref[e], count_ref[e, 0])
    loc_out[e] = loc
    err_out[e] = err
    active_out[e, :] = act
    kinv_out[e] = kv
    alpha_out[e] = al
    counts.append(count_new)
  count_out[:, :] = jnp.stack(counts).reshape(E_BLK, 1)


def _pack_obs(x_m, y_m, pressure_pa, elapsed_s, error_u, error_v, enabled):
  return jnp.stack([
      jnp.asarray(x_m, jnp.float32), jnp.asarray(y_m, jnp.float32),
      jnp.asarray(pressure_pa, jnp.float32),
      jnp.asarray(elapsed_s, jnp.float32),
      jnp.asarray(error_u, jnp.float32), jnp.asarray(error_v, jnp.float32),
      jnp.asarray(enabled, jnp.float32) * jnp.float32(1.0),
      jnp.zeros_like(jnp.asarray(x_m, jnp.float32))], axis=-1)


@functools.partial(jax.jit, static_argnames=('interpret',))
def observe(state: wind_gp.WindGPState, x_m, y_m, pressure_pa, elapsed_s,
            error_u, error_v, enabled=True,
            interpret: bool = None) -> wind_gp.WindGPState:
  """Drop-in fused twin of wind_gp.observe (single env; vmap for batches).

  interpret=None resolves to "not on TPU" (the interpreter keeps the
  kernel testable on CPU)."""
  if interpret is None:
    interpret = jax.default_backend() != 'tpu'
  obs = _pack_obs(x_m, y_m, pressure_pa, elapsed_s, error_u, error_v,
                  enabled)[None, :]  # (1, 8)

  out_shapes = (
      jax.ShapeDtypeStruct((CAP, 4), jnp.float32),   # locations
      jax.ShapeDtypeStruct((CAP, 2), jnp.float32),   # errors
      jax.ShapeDtypeStruct((1, CAP), jnp.float32),   # active
      jax.ShapeDtypeStruct((CAP, CAP), jnp.float32),  # kinv
      jax.ShapeDtypeStruct((CAP, 2), jnp.float32),   # alpha
      jax.ShapeDtypeStruct((1, 1), jnp.int32),       # count
  )
  loc, err, active, kinv, alpha, count = pl.pallas_call(
      _kernel,
      out_shape=out_shapes,
      in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
      out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
      interpret=interpret,
  )(obs, state.locations, state.errors,
    state.active.astype(jnp.float32)[None, :], state.kinv, state.alpha,
    state.count.reshape(1, 1))
  return wind_gp.WindGPState(
      locations=loc, errors=err, active=active[0] > 0.5, kinv=kinv,
      alpha=alpha, count=count[0, 0])


@functools.partial(jax.jit, static_argnames=('interpret',))
def observe_batched(state: wind_gp.WindGPState, x_m, y_m, pressure_pa,
                    elapsed_s, error_u, error_v, enabled=True,
                    interpret: bool = None) -> wind_gp.WindGPState:
  """Whole-batch observe: E_BLK envs per grid program.

  `state` leaves carry a leading (E,) env axis. Falls back to the vmapped
  single-env kernel when E is not a multiple of E_BLK. interpret=None
  resolves to "not on TPU" (CPU-testable, see env._post_physics_batched).
  """
  if interpret is None:
    interpret = jax.default_backend() != 'tpu'
  n = state.kinv.shape[0]
  if n % E_BLK:
    en = jnp.broadcast_to(jnp.asarray(enabled), (n,))
    return jax.vmap(
        lambda s, a, b, c, d, e, f, g: observe(s, a, b, c, d, e, f, g,
                                               interpret=interpret))(
        state, jnp.broadcast_to(jnp.asarray(x_m, jnp.float32), (n,)),
        jnp.broadcast_to(jnp.asarray(y_m, jnp.float32), (n,)),
        jnp.broadcast_to(jnp.asarray(pressure_pa, jnp.float32), (n,)),
        jnp.broadcast_to(jnp.asarray(elapsed_s, jnp.float32), (n,)),
        jnp.broadcast_to(jnp.asarray(error_u, jnp.float32), (n,)),
        jnp.broadcast_to(jnp.asarray(error_v, jnp.float32), (n,)), en)

  bc = lambda v: jnp.broadcast_to(jnp.asarray(v, jnp.float32), (n,))
  obs = _pack_obs(bc(x_m), bc(y_m), bc(pressure_pa), bc(elapsed_s),
                  bc(error_u), bc(error_v),
                  jnp.broadcast_to(jnp.asarray(enabled), (n,)))  # (E, 8)

  grid = (n // E_BLK,)
  def bs(shape):
    return pl.BlockSpec((E_BLK,) + shape,
                        lambda i: (i,) + (0,) * len(shape),
                        memory_space=pltpu.VMEM)
  out_shapes = (
      jax.ShapeDtypeStruct((n, CAP, 4), jnp.float32),
      jax.ShapeDtypeStruct((n, CAP, 2), jnp.float32),
      jax.ShapeDtypeStruct((n, CAP), jnp.float32),
      jax.ShapeDtypeStruct((n, CAP, CAP), jnp.float32),
      jax.ShapeDtypeStruct((n, CAP, 2), jnp.float32),
      jax.ShapeDtypeStruct((n, 1), jnp.int32),
  )
  in_specs = [bs((8,)), bs((CAP, 4)), bs((CAP, 2)), bs((CAP,)),
              bs((CAP, CAP)), bs((CAP, 2)), bs((1,))]
  out_specs = [bs((CAP, 4)), bs((CAP, 2)), bs((CAP,)), bs((CAP, CAP)),
               bs((CAP, 2)), bs((1,))]
  loc, err, active, kinv, alpha, count = pl.pallas_call(
      _kernel_blocked,
      grid=grid,
      out_shape=out_shapes,
      in_specs=in_specs,
      out_specs=out_specs,
      interpret=interpret,
      # CompilerParams is the recent rename of TPUCompilerParams; guard so
      # an older pinned JAX on a TPU host degrades to default compiler
      # params instead of an AttributeError at trace time (ADVICE r4).
      compiler_params=None if interpret else (
          getattr(pltpu, 'CompilerParams',
                  getattr(pltpu, 'TPUCompilerParams', lambda **kw: None))(
                      dimension_semantics=('parallel',))),
  )(obs, state.locations, state.errors,
    state.active.astype(jnp.float32), state.kinv, state.alpha,
    state.count.reshape(n, 1))
  return wind_gp.WindGPState(
      locations=loc, errors=err, active=active > 0.5, kinv=kinv,
      alpha=alpha, count=count[:, 0])
