"""Fused Pallas GP observe vs the XLA path (ops/pallas_gp_observe.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ble_tpu.env import wind_gp
from ble_tpu.ops import pallas_gp_observe


def _trajectory(key, n_obs):
  """A drifting balloon track of (x, y, p, t, eu, ev) observations."""
  ks = jax.random.split(key, n_obs)
  x = y = 0.0
  p = 9000.0
  rows = []
  for i in range(n_obs):
    dx, dy, dp, eu, ev = np.asarray(
        jax.random.normal(ks[i], (5,)) * jnp.asarray(
            [2000.0, 2000.0, 150.0, 1.0, 1.0]))
    x, y, p = x + dx, y + dy, float(np.clip(p + dp, 5500, 13500))
    rows.append((x, y, p, 180.0 * (i + 1), float(eu), float(ev)))
  return rows


def _assert_state_close(a, b, atol):
  np.testing.assert_array_equal(np.asarray(a.active), np.asarray(b.active))
  np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))
  np.testing.assert_allclose(np.asarray(a.locations),
                             np.asarray(b.locations), atol=1e-6)
  np.testing.assert_allclose(np.asarray(a.errors), np.asarray(b.errors),
                             atol=1e-6)
  np.testing.assert_allclose(np.asarray(a.kinv), np.asarray(b.kinv),
                             atol=atol)
  np.testing.assert_allclose(np.asarray(a.alpha), np.asarray(b.alpha),
                             atol=atol)


def test_observe_matches_xla_incremental():
  """Step-by-step parity over a 150-obs track (covers ring eviction at
  CAPACITY=128 and in-window churn).

  5e-3 atol pairwise: the kernel applies the SAME sequential rank-1
  updates but accumulates in a different order (Gram-matrix pivot
  recurrences vs the XLA path's rank-8 HIGHEST matmul). The meaningful
  accuracy metric is drift vs the EXACT inverse, asserted at the end:
  both paths sit at the same f32 rounding floor (~1e-3 after 150
  un-refreshed inserts; production refreshes every 64 steps)."""
  ref = wind_gp.init()
  fused = wind_gp.init()
  obs_ref = jax.jit(wind_gp.observe)
  for row in _trajectory(jax.random.PRNGKey(0), 150):
    ref = obs_ref(ref, *row)
    fused = pallas_gp_observe.observe(fused, *row, interpret=True)
    _assert_state_close(fused, ref, atol=5e-3)
  exact_r = wind_gp.refresh(ref)
  exact_f = wind_gp.refresh(fused)
  drift_ref = float(jnp.abs(ref.alpha - exact_r.alpha).max())
  drift_fused = float(jnp.abs(fused.alpha - exact_f.alpha).max())
  assert drift_fused < max(2.0 * drift_ref, 3e-3), (drift_fused, drift_ref)


def test_observe_expiry_parity():
  """Time jumps past the 6 h horizon exercise the Schur downdates."""
  ref = wind_gp.init()
  fused = wind_gp.init()
  obs_ref = jax.jit(wind_gp.observe)
  rows = _trajectory(jax.random.PRNGKey(1), 30)
  # Re-time the tail so earlier observations expire two-at-a-time.
  rows = rows[:20] + [(x, y, p, t + 6.5 * 3600, eu, ev)
                      for (x, y, p, t, eu, ev) in rows[20:]]
  for row in rows:
    ref = obs_ref(ref, *row)
    fused = pallas_gp_observe.observe(fused, *row, interpret=True)
  _assert_state_close(fused, ref, atol=5e-4)


def test_observe_disabled_is_noop():
  state = wind_gp.init()
  for row in _trajectory(jax.random.PRNGKey(2), 10):
    state = pallas_gp_observe.observe(state, *row, interpret=True)
  frozen = pallas_gp_observe.observe(state, 1.0, 2.0, 9000.0, 99999.0,
                                     0.5, -0.5, enabled=False,
                                     interpret=True)
  _assert_state_close(frozen, state, atol=0.0)


def test_observe_posterior_matches():
  """End-to-end check through the query: posteriors agree."""
  ref = wind_gp.init()
  fused = wind_gp.init()
  obs_ref = jax.jit(wind_gp.observe)
  for row in _trajectory(jax.random.PRNGKey(3), 60):
    ref = obs_ref(ref, *row)
    fused = pallas_gp_observe.observe(fused, *row, interpret=True)
  pres = jnp.linspace(5500.0, 13500.0, 37)
  n = pres.shape[0]
  q = jnp.stack([jnp.full((n,), 500.0), jnp.full((n,), -1200.0), pres,
                 jnp.full((n,), 60 * 180.0)], axis=-1)
  m_ref, d_ref = jax.jit(wind_gp.query)(ref, q)
  m_f, d_f = jax.jit(wind_gp.query)(fused, q)
  # 2e-3 m/s: reduction-order rounding (see the incremental test note);
  # well under the incremental path's own ~1e-2 un-refreshed drift.
  np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_ref), atol=2e-3)
  np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_ref), atol=2e-4)


def test_observe_tpu_hardware_parity():
  """The real Mosaic lowering vs the XLA path. Skipped off-TPU."""
  import pytest
  if jax.default_backend() != 'tpu':
    pytest.skip('requires a real TPU lowering')
  ref = wind_gp.init()
  fused = wind_gp.init()
  obs_ref = jax.jit(wind_gp.observe)
  for row in _trajectory(jax.random.PRNGKey(4), 140):
    ref = obs_ref(ref, *row)
    fused = pallas_gp_observe.observe(fused, *row)
  np.testing.assert_allclose(np.asarray(fused.kinv), np.asarray(ref.kinv),
                             atol=5e-3)
  np.testing.assert_allclose(np.asarray(fused.alpha), np.asarray(ref.alpha),
                             atol=5e-3)


def test_observe_batched_matches_single():
  """The E_BLK-blocked grid kernel == the single-env kernel, including a
  mixed enabled mask and a non-multiple-of-E_BLK fallback batch."""
  for n in (16, 10):  # 16 = blocked path (E_BLK=8); 10 = vmap fallback.
    ref = wind_gp.init()
    b = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape).copy(),
                     ref)
    singles = [ref for _ in range(n)]
    key = jax.random.PRNGKey(7)
    for step in range(6):
      key, k = jax.random.split(key)
      xs, ys, eus, evs = jax.random.normal(k, (4, n)) * 1000.0
      ps = jnp.full((n,), 9000.0)
      ts = jnp.full((n,), 180.0 * (step + 1))
      en = jnp.arange(n) % 3 != 0  # Mixed enabled lanes.
      b = pallas_gp_observe.observe_batched(
          b, xs, ys, ps, ts, eus * 1e-3, evs * 1e-3, en, interpret=True)
      singles = [
          pallas_gp_observe.observe(
              singles[i], xs[i], ys[i], ps[i], ts[i], eus[i] * 1e-3,
              evs[i] * 1e-3, en[i], interpret=True)
          for i in range(n)
      ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *singles)
    for name in ('locations', 'errors', 'active', 'kinv', 'alpha', 'count'):
      np.testing.assert_allclose(
          np.asarray(getattr(b, name), np.float32),
          np.asarray(getattr(stacked, name), np.float32), atol=1e-6,
          err_msg=f'{name} n={n}')
