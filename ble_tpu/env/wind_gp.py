"""Gaussian-process wind estimator with an incrementally-updated inverse.

The reference refits a scikit-learn `GaussianProcessRegressor` (Matern
nu=0.5, fixed hyperparameters) from scratch on every feature construction
(``env/wind_gp.py:143-215``) -- the hottest CPU path in the benchmark
(SURVEY.md 3.1). A direct port (batched Cholesky per step) is already
~1000x faster, but TPU factorizations are sequential-panel loops; instead
we exploit the streaming structure of the problem:

  - exactly ONE observation arrives per agent step (observe), and
  - observations leave the 6-hour freshness window monotonically,

so the masked kernel-matrix INVERSE is maintained by O(K^2) bordered
updates (Sherman-Morrison block form) on insert and Schur-complement
downdates on expiry -- a handful of rank-1 outer products per step, fully
vectorizable over thousands of envs. A periodic exact refresh (one real
solve) bounds float32 error accumulation; `REFRESH_PERIOD` trades its
amortized cost against drift (see tests/test_wind.py trajectory test).

Kernel and scalings match wind_gp.py:33-79: k(a, b) = sigma_f^2 *
exp(-||(a-b)/ls||) with ls = (357 km, 357 km, 326 Pa, 34560 s), plus
alpha=0.05 on the diagonal. Invalid/stale slots are identity rows with
zero targets, so they contribute exactly nothing.

Capacity: at the 3-minute cadence the 6-hour window holds at most 121
observations; CAPACITY=128 loses nothing.
"""

import jax
import jax.numpy as jnp
from flax import struct

CAPACITY = 128
TIME_HORIZON_S = 6 * 3600

# TPU matmuls default to bf16 inputs; the masked-kernel inverse is wildly
# ill-conditioned in the normal regime (the balloon barely moves between
# 3-minute observations, so kernel rows are near-duplicates and the schur
# complements cancel to ~sigma_noise^2 = 0.05 out of operands of ~13).
# bf16 error (~4e-3 relative) swamps that cancellation and the inverse
# blows up to inf within a handful of steps. Every contraction touching
# kinv/alpha therefore runs at HIGHEST (true f32) precision; the cost is
# negligible (rank-8 updates on a 128x128 matrix).
_PREC = jax.lax.Precision.HIGHEST

LENGTH_SCALES = jnp.asarray([357000.0, 357000.0, 326.0, 34560.0], jnp.float32)
SIGMA_EXP_SQUARED = 3.6 ** 2
SIGMA_NOISE_SQUARED = 0.05

# Exact-inverse refresh cadence (steps). The bordered updates are exact in
# infinite precision; this just bounds f32 drift.
REFRESH_PERIOD = 64


@struct.dataclass
class WindGPState:
  locations: jnp.ndarray  # (CAPACITY, 4): x_m, y_m, pressure_pa, time_s.
  errors: jnp.ndarray  # (CAPACITY, 2): measured - forecast (u, v).
  active: jnp.ndarray  # (CAPACITY,) bool.
  kinv: jnp.ndarray  # (CAPACITY, CAPACITY) inverse of the masked kernel.
  alpha: jnp.ndarray  # (CAPACITY, 2) = kinv @ masked targets.
  count: jnp.ndarray  # int32, total observations ever written.


def init() -> WindGPState:
  return WindGPState(
      locations=jnp.zeros((CAPACITY, 4), jnp.float32),
      errors=jnp.zeros((CAPACITY, 2), jnp.float32),
      active=jnp.zeros((CAPACITY,), jnp.bool_),
      kinv=jnp.eye(CAPACITY, dtype=jnp.float32),
      alpha=jnp.zeros((CAPACITY, 2), jnp.float32),
      count=jnp.int32(0))


def _kernel(a, b):
  """Matern nu=0.5 with anisotropic length scales; (..., N, 4) x
  (..., M, 4) -> (..., N, M)."""
  diff = (a[..., :, None, :] - b[..., None, :, :]) / LENGTH_SCALES
  d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
  return SIGMA_EXP_SQUARED * jnp.exp(-d)


def _kernel_vec(loc, locations):
  """k(loc, locations): (4,) x (CAP, 4) -> (CAP,)."""
  diff = (locations - loc) / LENGTH_SCALES
  d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
  return SIGMA_EXP_SQUARED * jnp.exp(-d)


def observe(state: WindGPState, x_m, y_m, pressure_pa, elapsed_s,
            error_u, error_v, enabled=True) -> WindGPState:
  """Adds one (location, forecast-error) measurement
  (reference wind_gp.py:98-119) and expires stale ones.

  `enabled=False` (a traced bool is fine) makes the call a no-op. The
  harness uses this for frozen post-terminal balloons: repeatedly
  inserting an EXACT duplicate point (frozen position + frozen clock)
  drives the masked kernel towards rank deficiency; each bordered insert
  then cancels O(sigma_f^2) operands down to the clamped noise floor and
  the f32 rounding error compounds multiplicatively -- the inverse
  blows up to inf within ~100 duplicate inserts. The reference never
  steps a terminal balloon at all (balloon.py:288 asserts), so skipping
  the observe matches its semantics exactly.

  All of this step's inverse modifications (<=2 window expiries, ring-slot
  eviction, one insert) are sequential clamped rank-1 updates
  kinv' = kinv + sum_j c_j w_j w_j^T, and every w_j lives in the span of
  a fixed 9-column basis  B = [kinv @ U | U[:, :4]]  (U = the 4 slot
  one-hots + the new kernel column). The sequential algorithm — including
  the exact-arithmetic clamps on the removal pivot
  (d >= 1/(sigma_f^2+sigma_n^2)) and the insert Schur complement
  (>= sigma_noise^2) that keep the f32 inverse stable in the
  near-duplicate regime — therefore runs in 9-dimensional COORDINATES
  (inner products come from S = U^T kinv U and T = E^T U); the real
  update vectors are reconstructed at the end with ONE matmul
  W = B @ G, followed by the same rank-8 outer-product update as the
  per-vector scheme.

  Big-matrix traffic: 5 (CAP, .)-touching matmuls total (M = kinv @ U,
  S/T, W = B G, the rank-8 update, alpha) instead of the naive
  one-kernel-per-modification (~25 launches; the step is launch-bound,
  STATUS.md). Two rejected variants, for the record: (a) a one-shot
  block-Woodbury (8x8 solve, no per-update clamps) blows up
  exponentially in the eviction-churn regime — the clamps are
  load-bearing; (b) applying the update as the composite sandwich
  kinv + B Z B^T loses ~1 decimal digit to cross-column cancellation in
  the f32 matmul accumulator (10x worse posterior drift) — hence the
  real-space rank-8 form. alpha is recomputed exactly from kinv' (one
  (CAP, CAP) @ (CAP, 2) matmul), tighter than low-rank alpha tracking.

  Numerics (measured; tests/test_wind.py::test_wind_gp_960_step_churn_
  drift): over a full 960-step episode with ~830 ring evictions the
  incremental posterior MEAN sits ~1e-2 m/s from the exact inverse — a
  float32 rounding floor set by cond(K) ~ 1e4 in the near-duplicate
  regime, independent of refresh cadence — while deviations track to
  <1e-4. The exact f32 inverse itself matches a float64 sklearn oracle
  to ~4e-4 m/s. eval/learner call `refresh` every REFRESH_PERIOD steps
  (between scan chunks) to pin the state to that baseline, which bounds
  growth on arbitrarily long horizons; 1e-2 m/s is 0.3% of SIGMA_EXP and
  <1e-3 in feature units after the 30 m/s magnitude squash.
  """
  if jax.default_backend() == 'tpu':
    # Fused single-kernel form: kinv lives in VMEM for the whole update
    # (one HBM read + one write instead of ~5 streamed matmuls whose tiny
    # minor dims pad catastrophically under vmap; the round-4 per-stage
    # profile in docs/benchmarks.md). Same algorithm, hardware-parity
    # pinned by tests/test_pallas_gp_observe.py.
    from ble_tpu.ops import pallas_gp_observe
    return pallas_gp_observe.observe(state, x_m, y_m, pressure_pa,
                                     elapsed_s, error_u, error_v,
                                     enabled=enabled)
  t = jnp.asarray(elapsed_s, jnp.float32)
  loc = jnp.stack([jnp.asarray(x_m, jnp.float32),
                   jnp.asarray(y_m, jnp.float32),
                   jnp.asarray(pressure_pa, jnp.float32), t])
  err = jnp.stack([jnp.asarray(error_u, jnp.float32),
                   jnp.asarray(error_v, jnp.float32)])

  kinv, active = state.kinv, state.active
  iota = jnp.arange(CAPACITY)

  # --- Determine every slot change up front (no kinv reads needed). ---
  stale = jnp.logical_and(active,
                          (t - state.locations[:, 3]) >= TIME_HORIZON_S)
  e1 = jnp.where(jnp.any(stale),
                 (iota == jnp.argmax(stale)).astype(jnp.float32), 0.0)
  stale2 = jnp.logical_and(stale, e1 < 0.5)
  e2 = jnp.where(jnp.any(stale2),
                 (iota == jnp.argmax(stale2)).astype(jnp.float32), 0.0)

  slot = state.count % CAPACITY
  slot_e = (iota == slot).astype(jnp.float32)
  removed12 = jnp.logical_or(e1 > 0.5, e2 > 0.5)
  active_after_rm = jnp.logical_and(active, jnp.logical_not(removed12))
  eo = jnp.where(active_after_rm[slot], slot_e, 0.0)
  active_pre_insert = jnp.logical_and(active_after_rm, eo < 0.5)

  # Index literal pinned to slot's dtype: under jax_enable_x64 (the f64
  # parity lane) a bare Python 0 promotes to int64 while state.count stays
  # int32, and dynamic_update_slice rejects mixed index types.
  zero = jnp.asarray(0, slot.dtype)
  locations = jax.lax.dynamic_update_slice(state.locations, loc[None, :],
                                           (slot, zero))
  errors = jax.lax.dynamic_update_slice(state.errors, err[None, :],
                                        (slot, zero))
  active_final = jnp.logical_or(active_pre_insert, slot_e > 0.5)
  targets = jnp.where(active_final[:, None], errors, 0.0)

  # --- Update columns: the 4 slot one-hots and the new kernel column
  # (against the post-removal active set). A one-hot is the zero vector
  # when its modification does not happen, which makes every degenerate
  # term below an exact no-op with NO masking (zero basis columns
  # contribute nothing regardless of their Z coefficients).
  v = jnp.where(active_pre_insert, _kernel_vec(loc, state.locations), 0.0)
  u_mat = jnp.stack([e1, e2, eo, slot_e, v], axis=1)  # (CAP, 5)

  # --- Small-space bookkeeping in the basis B = [kinv @ U | U[:, :4]].
  m_mat = jnp.matmul(kinv, u_mat, precision=_PREC)  # (CAP, 5)
  s_mat = jnp.matmul(u_mat.T, m_mat, precision=_PREC)  # (5, 5) = U^T kinv U
  t_mat = jnp.matmul(u_mat[:, :4].T, u_mat, precision=_PREC)  # (4,5) E^T U

  d0 = SIGMA_EXP_SQUARED + SIGMA_NOISE_SQUARED

  eye9 = jnp.eye(9, dtype=jnp.float32)

  def q_of(col):  # B^T @ U[:, col] in basis coordinates.
    return jnp.concatenate([s_mat[:, col], t_mat[:, col]])

  gs = []  # Update vectors in basis coordinates: w_j = B @ g_j.
  cs = []  # Their rank-1 coefficients: kinv' = kinv + sum c_j w_j w_j^T.

  def z_matvec(q):
    r = jnp.zeros((9,), jnp.float32)
    for g, c in zip(gs, cs):
      r = r + c * g * jnp.dot(g, q)
    return r

  def downdate(col_e, removing):
    """Schur removal of the slot whose one-hot is U[:, col_e].

    kinv_j e = B (eye[col_e] + Z q)  since kinv e is basis column
    col_e and B^T e = q; the clamp is the original exact-arithmetic
    bound (d = (K^-1)_ss >= 1/K_ss) that keeps rounding from flipping
    the pivot sign or exploding the division.
    """
    q = q_of(col_e)
    g_col = eye9[col_e] + z_matvec(q)
    d = jnp.dot(q, g_col)
    d_min = 1.0 / d0
    safe_d = jnp.where(jnp.abs(d) > d_min, d,
                       jnp.where(removing, d_min, 1.0))
    gs.append(jnp.where(removing, g_col, 0.0))
    cs.append(-1.0 / safe_d)
    # Restore the identity slot: + e e^T (basis column 5 + col_e; the
    # zero vector when the modification does not happen).
    gs.append(eye9[5 + col_e])
    cs.append(jnp.float32(1.0))

  downdate(0, jnp.sum(e1) > 0)
  downdate(1, jnp.sum(e2) > 0)
  downdate(2, jnp.sum(eo) > 0)

  # Bordered insert at `slot` (an identity row post-removals). slot_e
  # is U column 3 = basis column 8.
  q_v = q_of(4)
  g_u = eye9[4] + z_matvec(q_v)
  # Exact Schur >= sigma_noise^2 (posterior variance at an observed
  # point cannot fall below the noise floor).
  schur = jnp.maximum(d0 - jnp.dot(q_v, g_u), SIGMA_NOISE_SQUARED)
  gs.append(g_u - eye9[8])
  cs.append(1.0 / schur)
  gs.append(eye9[8])
  cs.append(jnp.float32(-1.0))

  g_mat = jnp.stack(gs, axis=1).astype(jnp.float32)  # (9, 8)
  c_vec = jnp.stack(cs).astype(jnp.float32)  # (8,)

  # --- Reconstruct the real update vectors with ONE matmul, then apply
  # the same rank-8 outer-product update as the per-vector scheme (the
  # fully composite B Z B^T sandwich loses ~1 decimal digit to
  # cross-column cancellation; this form matches the round-1 numerics).
  b_mat = jnp.concatenate([m_mat, u_mat[:, :4]], axis=1)  # (CAP, 9)
  w_mat = jnp.matmul(b_mat, g_mat, precision=_PREC)  # (CAP, 8)
  kinv_new = kinv + jnp.matmul(w_mat * c_vec, w_mat.T, precision=_PREC)

  # alpha recomputed exactly from the new inverse: one more (CAP, CAP)
  # matmul, tighter than incremental alpha tracking.
  alpha = jnp.matmul(kinv_new, targets, precision=_PREC)

  new_state = WindGPState(locations=locations, errors=errors,
                          active=active_final, kinv=kinv_new, alpha=alpha,
                          count=state.count + 1)
  if enabled is True:  # Static fast path: no select needed.
    return new_state
  return jax.tree.map(lambda n, o: jnp.where(enabled, n, o), new_state, state)


def _exact_inverse(locations, active):
  """Exact masked-kernel inverse (identity rows on inactive slots)."""
  k = _kernel(locations, locations)
  mask2 = jnp.logical_and(active[:, None], active[None, :])
  k = jnp.where(mask2, k, 0.0)
  eye = jnp.eye(CAPACITY, dtype=jnp.float32)
  diag = jnp.where(active, SIGMA_NOISE_SQUARED, 1.0)
  k_diag = jnp.diagonal(k)
  k = k * (1.0 - eye) + eye * (jnp.where(active, k_diag, 0.0) + diag)
  with jax.default_matmul_precision('highest'):
    chol = jax.lax.linalg.cholesky(k)
    return jax.scipy.linalg.cho_solve((chol, True), eye)


def refresh(state: WindGPState) -> WindGPState:
  """Recomputes the inverse exactly (also usable after checkpoint restore)."""
  kinv = _exact_inverse(state.locations, state.active)
  targets = jnp.where(state.active[:, None], state.errors, 0.0)
  return state.replace(kinv=kinv,
                       alpha=jnp.matmul(kinv, targets, precision=_PREC))


def query(state: WindGPState, query_locations) -> tuple:
  """GP posterior at query points.

  Args:
    state: the GP state (single env; vmap for batches).
    query_locations: (N, 4) [x_m, y_m, pressure_pa, time_s] queries.

  Returns:
    (mean_errors (N, 2), deviations (N,)): predicted forecast errors and
    normalized variances in [0, 1] (wind_gp.py:190-207). With zero valid
    observations both are zero (wind_gp.py:161-163).
  """
  query_locations = jnp.asarray(query_locations, jnp.float32)
  any_valid = jnp.any(state.active)

  k_star = _kernel(query_locations, state.locations)  # (N, CAPACITY)
  k_star = jnp.where(state.active[None, :], k_star, 0.0)

  # HIGHEST precision: the variance is a cancellation of O(sigma_f^2)
  # terms down to O(sigma_noise^2) in the near-duplicate regime; bf16
  # matmul error is orders of magnitude larger than the result.
  means = jnp.matmul(k_star, state.alpha, precision=_PREC)  # (N, 2)
  v = jnp.matmul(k_star, state.kinv, precision=_PREC)  # (N, CAPACITY)
  var = SIGMA_EXP_SQUARED - jnp.sum(k_star * v, axis=-1)
  deviations = jnp.clip(var / SIGMA_EXP_SQUARED, 0.0, 1.0)

  means = jnp.where(any_valid, means, 0.0)
  deviations = jnp.where(any_valid, deviations, 0.0)
  return means, deviations


def query_column(state: WindGPState, x_m, y_m, elapsed_s, pressures):
  """GP posterior at a pressure column sharing one (x, y, t).

  The feature constructor's hot query (181 levels per env per step). On
  TPU this dispatches to the fused Pallas kernel (ops/pallas_gp.py) that
  keeps the k* matrix in VMEM instead of round-tripping it through HBM;
  elsewhere (and for parity tooling) it is exactly `query`.
  """
  if jax.default_backend() == 'tpu':
    from ble_tpu.ops import pallas_gp
    return pallas_gp.query_column(state, x_m, y_m, elapsed_s, pressures)
  pressures = jnp.asarray(pressures, jnp.float32)
  n = pressures.shape[0]
  queries = jnp.stack([
      jnp.full((n,), jnp.asarray(x_m, jnp.float32)),
      jnp.full((n,), jnp.asarray(y_m, jnp.float32)),
      pressures,
      jnp.full((n,), jnp.asarray(elapsed_s, jnp.float32)),
  ], axis=-1)
  return query(state, queries)
