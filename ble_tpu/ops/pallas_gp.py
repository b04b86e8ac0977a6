"""Fused Pallas TPU kernel for the 181-level GP column query.

The wind feature constructor queries the GP posterior at 181 pressure
levels sharing one (x, y, t) (reference features.py:457-581 via
wind_gp.py:143-215). Under XLA the k* kernel matrix (181 x CAPACITY f32)
and the k*.Kinv workspace round-trip HBM every env step -- ~70 KiB/env of
the step's ~360 KiB/env mandatory traffic (docs/benchmarks.md roofline).
This kernel builds k* in VMEM from the observation table, runs both
contractions (means against alpha, variance against Kinv) on the MXU, and
writes only the (181, 3) result: the streamed inputs shrink to the 64 KiB
Kinv read plus ~3 KiB of tables.

Exploits the column structure: all 181 queries share (x, y, t), so the
x/y/t part of the Matern distance is one (CAPACITY,) lane vector and only
the pressure term varies per row.

Numerics match wind_gp.query at f32 (same masked kernel, same
sigma-normalized deviations; f32 MXU accumulation ~ Precision.HIGHEST):
tests/test_pallas_gp.py pins the interpreter-mode kernel against the XLA
path on randomly-populated GP states.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ble_tpu.env import wind_gp

NUM_LEVELS = 181

# Matern length scales as Python floats (the kernel can't close over
# device constants). Pinned against wind_gp.LENGTH_SCALES by the tests.
_LS = (357000.0, 357000.0, 326.0, 34560.0)


def _kernel(loc_t_ref, active_ref, alpha_ref, kinv_ref, q_ref, pres_ref,
            out_ref):
  """Single-env query (vmap adds the env grid dimension).

  Refs: loc_t (4, CAP) transposed observation locations; active (1, CAP)
  0/1 mask; alpha (CAP, 2); kinv (CAP, CAP); q (1, 4) = [x, y, t, pad];
  pres (NUM_LEVELS, 1) query pressures; out (NUM_LEVELS, 3) =
  [mean_u, mean_v, deviation].
  """
  lsx, lsy, lsp, lst = _LS
  active = active_ref[0, :]  # (CAP,)
  dx = (q_ref[0, 0] - loc_t_ref[0, :]) / lsx
  dy = (q_ref[0, 1] - loc_t_ref[1, :]) / lsy
  dt = (q_ref[0, 2] - loc_t_ref[3, :]) / lst
  c = dx * dx + dy * dy + dt * dt + 1e-12  # (CAP,) lane vector.
  dp = (pres_ref[:, :] - loc_t_ref[2, :][None, :]) / lsp  # (N, CAP)
  d = jnp.sqrt(c[None, :] + dp * dp)
  k_star = (wind_gp.SIGMA_EXP_SQUARED * jnp.exp(-d)) * active[None, :]

  # Precision pin (ADVICE r3): the variance is a cancellation of
  # O(sigma_f^2) terms down to O(sigma_noise^2); Mosaic's default MXU
  # matmul passes would be orders of magnitude above the result, so both
  # contractions must run full-f32 (matching wind_gp.query's HIGHEST).
  means = jnp.dot(k_star, alpha_ref[:, :],
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)  # (N, 2)
  v = jnp.dot(k_star, kinv_ref[:, :],
              preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST)  # (N, CAP)
  var = wind_gp.SIGMA_EXP_SQUARED - jnp.sum(k_star * v, axis=-1,
                                            keepdims=True)
  dev = jnp.clip(var / wind_gp.SIGMA_EXP_SQUARED, 0.0, 1.0)

  any_valid = (jnp.max(active) > 0.0).astype(jnp.float32)
  out_ref[:, 0:2] = means * any_valid
  out_ref[:, 2:3] = dev * any_valid


@functools.partial(jax.jit, static_argnames=('interpret',))
def query_column(state: wind_gp.WindGPState, x_m, y_m, elapsed_s,
                 pressures, interpret: bool = False):
  """GP posterior at NUM_LEVELS pressures sharing one (x, y, t).

  Single-env (vmap for batches). Returns (means (N, 2), deviations (N,)),
  exactly wind_gp.query's contract for the column case.
  """
  cap = wind_gp.CAPACITY
  loc_t = jnp.transpose(state.locations.astype(jnp.float32))  # (4, CAP)
  active = state.active.astype(jnp.float32)[None, :]  # (1, CAP)
  q = jnp.stack([jnp.asarray(x_m, jnp.float32),
                 jnp.asarray(y_m, jnp.float32),
                 jnp.asarray(elapsed_s, jnp.float32),
                 jnp.float32(0.0)])[None, :]  # (1, 4)
  pres = jnp.asarray(pressures, jnp.float32)[:, None]  # (N, 1)
  n = pres.shape[0]

  out = pl.pallas_call(
      _kernel,
      out_shape=jax.ShapeDtypeStruct((n, 3), jnp.float32),
      in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
      out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
      interpret=interpret,
  )(loc_t, active, state.alpha.astype(jnp.float32),
    state.kinv.astype(jnp.float32), q, pres)
  assert out.shape == (n, 3) and cap == loc_t.shape[1]
  return out[:, 0:2], out[:, 2]
