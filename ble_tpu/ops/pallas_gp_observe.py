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

Mirrors ble_tpu/env/wind_gp.observe exactly (same basis-space
bookkeeping, same exact-arithmetic clamps, same rank-8 real-space form);
tests/test_pallas_gp_observe.py pins bit-level agreement in interpret
mode and f32-tolerance agreement on hardware.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ble_tpu.env import wind_gp

CAP = wind_gp.CAPACITY
_PREC = jax.lax.Precision.HIGHEST


def _kernel(obs_ref, loc_ref, err_ref, active_ref, kinv_ref, alpha_ref,
            count_ref,
            loc_out, err_out, active_out, kinv_out, alpha_out, count_out):
  """One env's complete observe (vmap adds the env grid dimension).

  Refs: obs (1, 8) = [x, y, p, t, err_u, err_v, enabled, pad];
  loc (CAP, 4); err (CAP, 2); active (1, CAP) f32 0/1; kinv (CAP, CAP);
  alpha (CAP, 2); count (1, 1) i32.
  """
  x = obs_ref[0, 0]
  y = obs_ref[0, 1]
  p = obs_ref[0, 2]
  t = obs_ref[0, 3]
  enabled = obs_ref[0, 6] > 0.5

  active = active_ref[0, :]  # (CAP,) f32 0/1.
  kinv = kinv_ref[:, :]
  iota = jax.lax.broadcasted_iota(jnp.int32, (CAP,), 0)

  # --- Slot bookkeeping (wind_gp.observe lines: stale expiry, ring slot).
  # First-stale-index via f32 min-reduction (Mosaic's argmax lowering is
  # f32-only and its tie rule is not guaranteed; min(where(stale, i, CAP))
  # is branchless and picks the lowest index exactly like jnp.argmax on a
  # bool mask). No stale slot -> index CAP -> the one-hot is all zero.
  iota_f = iota.astype(jnp.float32)
  stale = jnp.logical_and(active > 0.5,
                          (t - loc_ref[:, 3]) >= wind_gp.TIME_HORIZON_S)
  first1 = jnp.min(jnp.where(stale, iota_f, jnp.float32(CAP)))
  e1 = (iota_f == first1).astype(jnp.float32)
  stale2 = jnp.logical_and(stale, e1 < 0.5)
  first2 = jnp.min(jnp.where(stale2, iota_f, jnp.float32(CAP)))
  e2 = (iota_f == first2).astype(jnp.float32)

  slot = count_ref[0, 0] % CAP
  slot_e = (iota == slot).astype(jnp.float32)
  removed12 = jnp.logical_or(e1 > 0.5, e2 > 0.5)
  active_after_rm = jnp.where(removed12, 0.0, active)
  slot_active = jnp.sum(slot_e * active_after_rm) > 0.5
  eo = jnp.where(slot_active, slot_e, 0.0)
  active_pre_insert = jnp.where(eo > 0.5, 0.0, active_after_rm)
  active_final = jnp.maximum(active_pre_insert, slot_e)

  # Branchless row replacement at `slot` (dynamic_update_slice equivalent).
  sm = slot_e[:, None]
  new_loc_row = jnp.concatenate([obs_ref[0, 0:4][None, :]] * 1, axis=0)
  locations = loc_ref[:, :] * (1.0 - sm) + sm * new_loc_row
  errors = (err_ref[:, :] * (1.0 - sm) +
            sm * obs_ref[0, 4:6][None, :])
  targets = errors * active_final[:, None]

  # --- New kernel column vs the post-removal active set.
  lsx, lsy, lsp, lst = (357000.0, 357000.0, 326.0, 34560.0)
  dx = (x - loc_ref[:, 0]) / lsx
  dy = (y - loc_ref[:, 1]) / lsy
  dp = (p - loc_ref[:, 2]) / lsp
  dt = (t - loc_ref[:, 3]) / lst
  d = jnp.sqrt(dx * dx + dy * dy + dp * dp + dt * dt + 1e-12)
  v = (wind_gp.SIGMA_EXP_SQUARED * jnp.exp(-d)) * active_pre_insert

  u_mat = jnp.stack([e1, e2, eo, slot_e, v], axis=1)  # (CAP, 5)

  m_mat = jnp.dot(kinv, u_mat, preferred_element_type=jnp.float32,
                  precision=_PREC)  # (CAP, 5)
  s_mat = jnp.dot(u_mat.T, m_mat, preferred_element_type=jnp.float32,
                  precision=_PREC)  # (5, 5)
  t_mat = jnp.dot(u_mat[:, :4].T, u_mat, preferred_element_type=jnp.float32,
                  precision=_PREC)  # (4, 5)

  d0 = wind_gp.SIGMA_EXP_SQUARED + wind_gp.SIGMA_NOISE_SQUARED
  eye9 = jnp.eye(9, dtype=jnp.float32)

  def q_of(col):
    return jnp.concatenate([s_mat[:, col], t_mat[:, col]])

  gs = []
  cs = []

  def z_matvec(q):
    r = jnp.zeros((9,), jnp.float32)
    for g, c in zip(gs, cs):
      r = r + c * g * jnp.sum(g * q)
    return r

  def downdate(col_e, removing):
    q = q_of(col_e)
    g_col = eye9[col_e] + z_matvec(q)
    dd = jnp.sum(q * g_col)
    d_min = 1.0 / d0
    safe_d = jnp.where(jnp.abs(dd) > d_min, dd,
                       jnp.where(removing, d_min, 1.0))
    gs.append(jnp.where(removing, g_col, 0.0))
    cs.append(-1.0 / safe_d)
    gs.append(eye9[5 + col_e])
    cs.append(jnp.float32(1.0))

  downdate(0, jnp.sum(e1) > 0)
  downdate(1, jnp.sum(e2) > 0)
  downdate(2, jnp.sum(eo) > 0)

  q_v = q_of(4)
  g_u = eye9[4] + z_matvec(q_v)
  schur = jnp.maximum(d0 - jnp.sum(q_v * g_u),
                      wind_gp.SIGMA_NOISE_SQUARED)
  gs.append(g_u - eye9[8])
  cs.append(1.0 / schur)
  gs.append(eye9[8])
  cs.append(jnp.float32(-1.0))

  g_mat = jnp.stack(gs, axis=1)  # (9, 8)
  c_vec = jnp.stack(cs)  # (8,)

  b_mat = jnp.concatenate([m_mat, u_mat[:, :4]], axis=1)  # (CAP, 9)
  w_mat = jnp.dot(b_mat, g_mat, preferred_element_type=jnp.float32,
                  precision=_PREC)  # (CAP, 8)
  kinv_new = kinv + jnp.dot(w_mat * c_vec[None, :], w_mat.T,
                            preferred_element_type=jnp.float32,
                            precision=_PREC)
  alpha = jnp.dot(kinv_new, targets, preferred_element_type=jnp.float32,
                  precision=_PREC)

  # enabled=False -> exact no-op (frozen post-terminal balloons).
  loc_out[:, :] = jnp.where(enabled, locations, loc_ref[:, :])
  err_out[:, :] = jnp.where(enabled, errors, err_ref[:, :])
  active_out[0, :] = jnp.where(enabled, active_final, active)
  kinv_out[:, :] = jnp.where(enabled, kinv_new, kinv)
  alpha_out[:, :] = jnp.where(enabled, alpha, alpha_ref[:, :])
  # (1, 1)-shaped store: Mosaic cannot store scalars to VMEM.
  count_out[:, :] = count_ref[:, :] + jnp.where(enabled, 1, 0)


@functools.partial(jax.jit, static_argnames=('interpret',))
def observe(state: wind_gp.WindGPState, x_m, y_m, pressure_pa, elapsed_s,
            error_u, error_v, enabled=True,
            interpret: bool = False) -> wind_gp.WindGPState:
  """Drop-in fused twin of wind_gp.observe (single env; vmap for batches)."""
  obs = jnp.stack([
      jnp.asarray(x_m, jnp.float32), jnp.asarray(y_m, jnp.float32),
      jnp.asarray(pressure_pa, jnp.float32),
      jnp.asarray(elapsed_s, jnp.float32),
      jnp.asarray(error_u, jnp.float32), jnp.asarray(error_v, jnp.float32),
      jnp.asarray(enabled, jnp.float32) * jnp.float32(1.0),
      jnp.float32(0.0)])[None, :]  # (1, 8)

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
