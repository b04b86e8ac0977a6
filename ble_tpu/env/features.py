"""Perciatelli feature construction, fused into the device step.

Re-design of the reference ``env/features.py``: the 1099-dimensional
feature vector (16 ambient + 3 x 361 balloon-centered wind levels,
features.py:270-293) is assembled with pure gathers and masks:

  - the GP wind column query is one batched Cholesky solve (wind_gp.py);
  - the 361-level centered column is a single index-arithmetic gather with
    an unreachable/(0,1,1) mask instead of the reference's per-level Python
    loop with scatter (features.py:457-581);
  - the accessible pressure range reuses the vectorized Newton column
    (pressure_range.py).

Everything vmaps over envs.
"""

import math

import jax.numpy as jnp
from flax import struct

from ble_tpu.env import balloon as balloon_lib
from ble_tpu.env import power_table
from ble_tpu.env import pressure_range
from ble_tpu.env import safety
from ble_tpu.env import solar
from ble_tpu.env import wind_field as wind_field_lib
from ble_tpu.env import wind_gp
from ble_tpu.utils import constants
from ble_tpu.utils import transforms

NUM_PRESSURE_LEVELS = 181
NUM_FEATURES = 3 * (NUM_PRESSURE_LEVELS * 2 - 1) + 16  # = 1099
TOLERANCE_M = 1e-5  # reference features.py:53

PRESSURE_LEVELS = jnp.linspace(constants.PERCIATELLI_PRESSURE_RANGE_MIN,
                               constants.PERCIATELLI_PRESSURE_RANGE_MAX,
                               NUM_PRESSURE_LEVELS)
_LEVEL_DELTA = float(PRESSURE_LEVELS[1] - PRESSURE_LEVELS[0])


def nearest_pressure_level(pressure):
  """Quantized level index in [0, 180] (features.py:357-380)."""
  p = jnp.clip(pressure, constants.PERCIATELLI_PRESSURE_RANGE_MIN,
               constants.PERCIATELLI_PRESSURE_RANGE_MAX)
  rescaled = (p - constants.PERCIATELLI_PRESSURE_RANGE_MIN) / _LEVEL_DELTA
  return jnp.round(rescaled).astype(jnp.int32)


def compute_sunrise_cycle(time_s, sunrise_s, sunset_s):
  """Normalized solar cycle in [0, 2pi] (features.py:72-103).

  `sunrise_s`/`sunset_s` are the NEXT sunrise/sunset (>= time_s).
  [last sunrise, sunset] -> [0, pi]; [last sunset, sunrise] -> [pi, 2pi].
  """
  t = time_s.astype(jnp.float32)
  sunrise = sunrise_s.astype(jnp.float32)
  sunset = sunset_s.astype(jnp.float32)
  day = 86400.0
  is_daytime = sunset < sunrise
  prev_sunrise = sunrise - day
  prev_sunset = sunset - day
  day_cycle = math.pi * (t - prev_sunrise) / (sunset - prev_sunrise)
  night_cycle = math.pi + math.pi * (t - prev_sunset) / (sunrise - prev_sunset)
  return jnp.where(is_daytime, day_cycle, night_cycle)


def ambient_features(params: balloon_lib.BalloonParams,
                     state: balloon_lib.BalloonState, sunrise_s, sunset_s):
  """The 16 ambient features (features.py:382-455). Returns (..., 16)."""
  soc = balloon_lib.battery_soc(params, state)
  pr = balloon_lib.pressure_ratio(state)

  lat, lng = balloon_lib.latlng(state)
  solar_angle, _, _ = solar.solar_calculator(lat, lng, state.time_s)

  cycle = compute_sunrise_cycle(state.time_s, sunrise_s, sunset_s)

  distance_m = jnp.sqrt(state.x_m ** 2 + state.y_m ** 2)
  heading = jnp.arctan2(-state.x_m / 1000.0, -state.y_m / 1000.0)

  power_to_use = power_table.lookup(pr, soc)

  nav_paused = balloon_lib.navigation_is_paused(state)
  excess = balloon_lib.excess_energy(params, state)

  return jnp.stack([
      transforms.linear_rescale_with_saturation(
          state.pressure_pa, constants.PERCIATELLI_PRESSURE_RANGE_MIN,
          constants.PERCIATELLI_PRESSURE_RANGE_MAX),
      soc,
      transforms.linear_rescale_with_saturation(solar_angle, -90.0, 90.0),
      jnp.sin(cycle),
      jnp.cos(cycle),
      jnp.sin(heading),
      jnp.cos(heading),
      transforms.squash_to_unit_interval(distance_m / 1000.0, 250.0),
      (state.last_command == safety.UP).astype(jnp.float32),
      (state.last_command == safety.STAY).astype(jnp.float32),
      (state.last_command == safety.DOWN).astype(jnp.float32),
      nav_paused.astype(jnp.float32),
      (~nav_paused).astype(jnp.float32),
      excess.astype(jnp.float32),
      transforms.linear_rescale_with_saturation(power_to_use, 100.0, 300.0),
      pr,
  ], axis=-1)


def wind_column_features(params, state: balloon_lib.BalloonState,
                         gp_state: wind_gp.WindGPState,
                         wind: wind_field_lib.WindFieldState,
                         atmosphere) -> jnp.ndarray:
  """The 3 x 361 balloon-centered wind features (features.py:457-581).

  Single-env version (vmap for batches). Returns (361, 3) as
  (uncertainty, angle_error, magnitude) rows; caller flattens.
  """
  elapsed = state.time_elapsed_s.astype(jnp.float32)
  error_means, deviations = wind_gp.query_column(
      gp_state, state.x_m, state.y_m, elapsed, PRESSURE_LEVELS)

  forecast_u, forecast_v = wind_field_lib.get_forecast(
      wind, state.x_m, state.y_m, PRESSURE_LEVELS, elapsed)
  return wind_column_features_precomputed(
      params, state, atmosphere, error_means, deviations,
      jnp.stack([forecast_u, forecast_v], axis=-1))


# Static 181-level pressure interpolation weights: contracting these with
# a wind column (10, 2) reproduces get_forecast at PRESSURE_LEVELS
# exactly (same _axis_weights formula on the fixed level grid), letting
# the batched step reuse the ONE effective_column it already computed for
# the balloon lookup instead of re-contracting the field slab.
_LEVEL_PRESSURE_WEIGHTS = wind_field_lib._axis_weights(
    PRESSURE_LEVELS, wind_field_lib.PRESSURE_SLICES,
    wind_field_lib.MIN_PRESSURE_PA, wind_field_lib.MAX_PRESSURE_PA)


def wind_column_features_precomputed(params, state: balloon_lib.BalloonState,
                                     atmosphere, error_means, deviations,
                                     forecast_uv) -> jnp.ndarray:
  """`wind_column_features` with the GP query and the 181-level forecast
  already computed (the fused-kernel path: the GP posterior comes out of
  ops/pallas_gp_window and the forecast from the step's single
  effective_column contraction).

  Args:
    error_means: (NUM_PRESSURE_LEVELS, 2) GP posterior forecast errors.
    deviations: (NUM_PRESSURE_LEVELS,) normalized posterior variances.
    forecast_uv: (NUM_PRESSURE_LEVELS, 2) forecast winds at the levels.
  """
  means = error_means + forecast_uv

  # Wind direction/magnitude per level.
  magnitudes = jnp.sqrt(jnp.sum(means ** 2, axis=-1))
  unit_winds = means / (magnitudes + TOLERANCE_M)[..., None]

  distance_m = jnp.sqrt(state.x_m ** 2 + state.y_m ** 2)
  station_dir = -jnp.stack([state.x_m, state.y_m]) / (distance_m +
                                                      TOLERANCE_M)

  cos_err = jnp.clip(unit_winds @ station_dir, -1.0, 1.0)
  angle_errors = jnp.arccos(cos_err)
  angle_errors = jnp.where(magnitudes < TOLERANCE_M, jnp.pi, angle_errors)
  angle_errors = jnp.where(distance_m < TOLERANCE_M,
                           jnp.zeros_like(angle_errors), angle_errors)

  angle_feats = angle_errors / math.pi
  magnitude_feats = transforms.squash_to_unit_interval(magnitudes, 30.0)

  # Accessible pressure range for reachability masking.
  lat, lng = balloon_lib.latlng(state)
  el_deg, _, flux = solar.solar_calculator(lat, lng, state.time_s)
  min_p, max_p = pressure_range.compute_pressure_range(
      params, atmosphere, el_deg, flux, state.upwelling_infrared_w_m2)

  reachable = jnp.logical_and(PRESSURE_LEVELS >= min_p,
                              PRESSURE_LEVELS <= max_p)

  level_data = jnp.stack([deviations, angle_feats, magnitude_feats], axis=-1)

  # Balloon-centered gather into 361 output levels: output j reads source
  # level l = j - 180 + balloon_level (features.py:484-556).
  balloon_level = nearest_pressure_level(state.pressure_pa)
  out_idx = jnp.arange(2 * NUM_PRESSURE_LEVELS - 1)
  src = out_idx - (NUM_PRESSURE_LEVELS - 1) + balloon_level
  in_bounds = jnp.logical_and(src >= 0, src < NUM_PRESSURE_LEVELS)
  # One-hot contraction instead of a batched-operand gather (slow on TPU):
  # onehot (361, 181) has one nonzero per in-bounds output level.
  onehot = (src[:, None] == jnp.arange(NUM_PRESSURE_LEVELS)[None, :]).astype(
      jnp.float32)
  gathered = onehot @ level_data  # (361, 3)
  reach = (onehot @ reachable.astype(jnp.float32)) > 0.5
  valid = jnp.logical_and(in_bounds, reach)

  unreachable_row = jnp.asarray([0.0, 1.0, 1.0], jnp.float32)
  return jnp.where(valid[:, None], gathered, unreachable_row)


def get_features(params, state: balloon_lib.BalloonState,
                 gp_state: wind_gp.WindGPState,
                 wind: wind_field_lib.WindFieldState, atmosphere,
                 sunrise_s, sunset_s) -> jnp.ndarray:
  """Full 1099-dim feature vector for one env (features.py:308-330)."""
  ambient = ambient_features(params, state, sunrise_s, sunset_s)
  column = wind_column_features(params, state, gp_state, wind, atmosphere)
  return jnp.concatenate([ambient, column.reshape(-1)], axis=-1)


def get_features_precomputed(params, state: balloon_lib.BalloonState,
                             atmosphere, sunrise_s, sunset_s,
                             error_means, deviations,
                             forecast_uv) -> jnp.ndarray:
  """`get_features` for the fused-kernel step: GP query + 181-level
  forecast supplied by the caller (see wind_column_features_precomputed).
  """
  ambient = ambient_features(params, state, sunrise_s, sunset_s)
  column = wind_column_features_precomputed(params, state, atmosphere,
                                            error_means, deviations,
                                            forecast_uv)
  return jnp.concatenate([ambient, column.reshape(-1)], axis=-1)


@struct.dataclass
class NamedFeatures:
  """Parsed feature vector (reference NamedPerciatelliFeatures,
  features.py:163-256), for feature-driven agents."""
  balloon_pressure: jnp.ndarray
  battery_charge: jnp.ndarray
  solar_elevation: jnp.ndarray
  sin_solar_cycle: jnp.ndarray
  cos_solar_cycle: jnp.ndarray
  sin_heading_to_station: jnp.ndarray
  cos_heading_to_station: jnp.ndarray
  distance_to_station: jnp.ndarray
  last_command: jnp.ndarray
  navigation_paused: jnp.ndarray
  has_excess_energy: jnp.ndarray
  descent_cost: jnp.ndarray
  internal_pressure_ratio: jnp.ndarray
  winds: jnp.ndarray  # (361, 3): uncertainty, bearing, magnitude.


def parse(features: jnp.ndarray) -> NamedFeatures:
  """Parses a (..., 1099) feature vector."""
  ambient = features[..., :16]
  winds = features[..., 16:].reshape(features.shape[:-1] + (361, 3))
  last_idx = jnp.argmax(ambient[..., 8:11], axis=-1)
  # Feature order up/stay/down -> command codes (features.py:206-215).
  last_command = jnp.where(last_idx == 0, safety.UP,
                           jnp.where(last_idx == 1, safety.STAY, safety.DOWN))
  return NamedFeatures(
      balloon_pressure=transforms.undo_linear_rescale_with_extrapolation(
          ambient[..., 0], constants.PERCIATELLI_PRESSURE_RANGE_MIN,
          constants.PERCIATELLI_PRESSURE_RANGE_MAX),
      battery_charge=ambient[..., 1],
      solar_elevation=ambient[..., 2],
      sin_solar_cycle=ambient[..., 3],
      cos_solar_cycle=ambient[..., 4],
      sin_heading_to_station=ambient[..., 5],
      cos_heading_to_station=ambient[..., 6],
      distance_to_station=ambient[..., 7],
      last_command=last_command,
      navigation_paused=ambient[..., 11],
      has_excess_energy=ambient[..., 13],
      descent_cost=ambient[..., 14],
      internal_pressure_ratio=ambient[..., 15],
      winds=winds)


def wind_is_valid(winds: jnp.ndarray) -> jnp.ndarray:
  """(..., 361) validity mask: invalid levels are exactly (0, 1, 1)
  (features.py:154-160)."""
  return ~((winds[..., 2] == 1.0) & (winds[..., 1] == 1.0) &
           (winds[..., 0] == 0.0))
