"""N-D regular-grid linear interpolation as gather + lerp.

Device-resident replacement for the reference's per-query
`scipy.interpolate.interpn` calls (``env/grid_based_wind_field.py:91``,
SURVEY.md 3.1): the 4-D wind grid stays in HBM/VMEM and a batch of query
points becomes one fused gather + weighted sum, vmappable over envs.
"""

import jax.numpy as jnp


def interp4d(grid, axes, points):
  """Quadrilinear interpolation on a regular 4-D grid with channels.

  Args:
    grid: (N0, N1, N2, N3, C) values.
    axes: tuple of 4 1-D arrays of UNIFORMLY-SPACED ascending coordinates
      (only the endpoints and length are used).
    points: (..., 4) query coordinates. Out-of-range queries are clamped to
      the grid edges (the caller is expected to pre-clamp for semantic
      clamping, as the reference does).

  Returns:
    (..., C) interpolated values.
  """
  n = jnp.asarray(grid.shape[:4])
  lo = jnp.stack([a[0] for a in axes])
  hi = jnp.stack([a[-1] for a in axes])
  # Fractional grid coordinates in [0, Ni-1].
  t = (points - lo) / (hi - lo) * (n - 1).astype(grid.dtype)
  t = jnp.clip(t, 0.0, (n - 1).astype(grid.dtype))

  i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
  frac = t - i0.astype(grid.dtype)  # (..., 4)

  flat = grid.reshape(-1, grid.shape[-1])
  s3 = grid.shape[3]
  s2 = grid.shape[2] * s3
  s1 = grid.shape[1] * s2
  strides = jnp.asarray([s1, s2, s3, 1], jnp.int32)
  base = jnp.sum(i0 * strides, axis=-1)  # (...,)

  # All 16 corners in ONE gather: precompute the static flat offsets and
  # the per-dim weight selectors, then contract corner weights in a single
  # einsum-like product. This keeps XLA to one fused gather per call
  # instead of 16 (important when vmapping over per-env grids).
  bits = [[(corner >> d) & 1 for d in range(4)] for corner in range(16)]
  corner_offsets = jnp.asarray(
      [sum(b * int(s) for b, s in zip(row, (s1, s2, s3, 1)))
       for row in bits], jnp.int32)  # (16,)
  corners = flat[base[..., None] + corner_offsets]  # (..., 16, C)

  bits_arr = jnp.asarray(bits, grid.dtype)  # (16, 4)
  # weight[..., corner] = prod_d frac_d^bit * (1-frac_d)^(1-bit)
  w = jnp.prod(frac[..., None, :] * bits_arr +
               (1.0 - frac[..., None, :]) * (1.0 - bits_arr), axis=-1)
  return jnp.sum(w[..., None] * corners, axis=-2)
