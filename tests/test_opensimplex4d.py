"""OpenSimplex 4-D parity noise: properties + JAX/numpy agreement.

The bit-level end-to-end comparison against the reference pipeline
(SimplexWindNoise on the opensimplex shim vs ble_tpu's uv_noise_exact from
the same PRNG key) lives in tests/test_reference_parity.py; these tests
cover the noise function itself without needing the reference checkout.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ble_tpu.env import opensimplex4d as osx
from ble_tpu.env import simplex_noise
from ble_tpu.env import wind_field


def test_perm_table_is_a_permutation_and_seed_sensitive():
  p17 = osx.perm_from_seed(17)
  assert sorted(p17.tolist()) == list(range(256))
  p18 = osx.perm_from_seed(18)
  assert (p17 != p18).any()
  # Negative / huge seeds exercise the Java two's-complement semantics.
  for seed in (-1, 2**63 - 1, -(2**62)):
    p = osx.perm_from_seed(seed)
    assert sorted(p.tolist()) == list(range(256))


def test_raw_variance_matches_opensimplex_calibration():
  """The reference calibrates against OPENSIMPLEX_VARIANCE = 0.0569
  (simplex_wind_noise.py:69); a faithful implementation reproduces it."""
  perm = osx.perm_from_seed(17)
  rng = np.random.default_rng(2)
  pts = rng.uniform(-50.0, 50.0, size=(4000, 4))
  vals = osx.noise4d_np(perm, pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3])
  assert 0.045 < float(np.var(vals)) < 0.07
  assert float(np.abs(vals).max()) <= 1.0
  # OpenSimplex is zero at the unperturbed origin -- the property the
  # reference's random grid translations exist to paper over
  # (simplex_wind_noise.py:108-113).
  assert osx.noise4d_np(perm, 0.0, 0.0, 0.0, 0.0) == 0.0


def test_candidate_superset_is_complete():
  """Widening the {-1..2}^4 lattice-candidate set must change nothing:
  every lattice point with attn > 0 is already enumerated."""
  perm = osx.perm_from_seed(3)
  rng = np.random.default_rng(5)
  pts = rng.uniform(-20.0, 20.0, size=(300, 4))
  narrow = osx.noise4d_np(perm, pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3])

  wide_offsets = np.stack(
      np.meshgrid(*([np.arange(-2, 4)] * 4), indexing='ij'),
      axis=-1).reshape(-1, 4)
  saved = osx._OFFSETS, osx._OFFSETS_SUM
  try:
    osx._OFFSETS, osx._OFFSETS_SUM = wide_offsets, wide_offsets.sum(-1)
    wide = osx.noise4d_np(perm, pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3])
  finally:
    osx._OFFSETS, osx._OFFSETS_SUM = saved
  np.testing.assert_allclose(wide, narrow, atol=1e-14)


def test_jax_matches_numpy():
  perm = osx.perm_from_seed(99)
  rng = np.random.default_rng(7)
  pts = rng.uniform(-30.0, 30.0, size=(512, 4)).astype(np.float32)
  ref = osx.noise4d_np(perm, pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3])
  mine = np.asarray(jax.jit(osx.noise4d)(
      jnp.asarray(perm), pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3]))
  np.testing.assert_allclose(mine, ref, atol=2e-5)


def test_continuity_across_cell_boundaries():
  perm = osx.perm_from_seed(4)
  # March across several stretched-cell boundaries in tiny steps; the
  # attn^4 kernel is C^1, so successive samples must stay close.
  t = np.linspace(-2.0, 2.0, 4001)
  vals = osx.noise4d_np(perm, t, 0.3 * t, -0.7 * t, 0.1 + 0.5 * t)
  assert float(np.abs(np.diff(vals)).max()) < 0.02


def test_uv_noise_exact_matches_shim_blend():
  """wind_field exact-noise mode == the same blend through the numpy path
  (two independent evaluations of the same algorithm)."""
  key = jax.random.PRNGKey(33)
  seeds, offsets, perms = wind_field.reset_noise_exact(key)
  state = wind_field.WindFieldState(
      field=jnp.zeros(wind_field.GRID_SHAPE, wind_field.FIELD_DTYPE),
      noise_seeds=seeds, noise_offsets=offsets, noise_perms=perms)

  rng = np.random.default_rng(11)
  xs_m = rng.uniform(-3e6, 3e6, size=32)
  ys_m = rng.uniform(-3e6, 3e6, size=32)
  ps = rng.uniform(5000.0, 14000.0, size=32)
  ts_s = rng.uniform(0.0, 240 * 3600.0, size=32)

  u, v = jax.jit(wind_field.get_noise)(state, xs_m, ys_m, ps, ts_s)

  # Independent numpy blend (reference NoisyWindComponent.get_noise math).
  perms_np = np.asarray(perms)
  offs_np = np.asarray(offsets, np.float64)
  mag = np.sqrt(1.02 / 0.0569)
  for comp, (component, harmonics) in enumerate(
      ((u, simplex_noise.U_HARMONICS), (v, simplex_noise.V_HARMONICS))):
    weighted = np.zeros(32)
    tw = tw2 = 0.0
    for h, (w_h, xs_sp, ys_sp, ps_sp, ts_sp) in enumerate(harmonics):
      n = mag * osx.noise4d_np(
          perms_np[comp, h],
          xs_m / 1000.0 / xs_sp + offs_np[comp, h, 0],
          ys_m / 1000.0 / ys_sp + offs_np[comp, h, 1],
          ps / ps_sp + offs_np[comp, h, 2],
          ts_s / 3600.0 / ts_sp + offs_np[comp, h, 3])
      weighted += n * w_h
      tw += w_h
      tw2 += w_h ** 2
    expected = weighted / tw * np.sqrt(tw / tw2)
    np.testing.assert_allclose(np.asarray(component), expected, atol=3e-4)


def test_fast_path_unchanged_without_perms():
  """Default states keep the hash-noise fast path (noise_perms=None)."""
  state = wind_field.make_state(
      jnp.zeros(wind_field.GRID_SHAPE), jax.random.PRNGKey(0))
  assert state.noise_perms is None
  u, v = wind_field.get_noise(state, 1e5, -2e5, 9000.0, 3600.0)
  assert np.isfinite(float(u)) and np.isfinite(float(v))
