"""StationSeeker: the rule-based station-keeping controller, vectorized.

Re-design of the reference ``agents/station_seeker_agent.py`` (Bellemare
et al. 2020 parameters): the per-level Python scoring loop
(station_seeker_agent.py:88-113) becomes one vectorized score over the 361
wind-column levels, so the whole policy is a few jnp ops and vmaps over
envs — it runs fused with the environment step on device.
"""

import jax
import jax.numpy as jnp

from ble_tpu.agents import base
from ble_tpu.env import features as features_lib
from ble_tpu.env import safety
from ble_tpu.utils import transforms

# Paper constants (station_seeker_agent.py:44-56).
HALF_RADIUS = 35.0
MAGNITUDE_WEIGHT = 0.07  # k_1
CLOSE_BEARING_WEIGHT = 0.6
FAR_BEARING_WEIGHT = 0.45
CLOSE_BEARING = 250.0
FAR_BEARING = 500.0
DEFAULT_SCORE = 0.5  # g_unknown
HYSTERESIS_K2 = 0.05
HYSTERESIS_K3 = 0.001
CONFIDENCE_EPSILON = 0.01

_MIDPOINT = 180  # Center of the 361-level balloon-centered column.


def scores(observation: jnp.ndarray) -> jnp.ndarray:
  """Altitude score for each of the 361 levels; invalid levels score 0.

  Args:
    observation: (..., 1099) Perciatelli features.

  Returns:
    (..., 361) scores.
  """
  parsed = features_lib.parse(observation)
  winds = parsed.winds  # (..., 361, 3)
  valid = features_lib.wind_is_valid(winds)

  uncertainty = winds[..., 0]
  bearing_rad = winds[..., 1] * jnp.pi  # undo linear rescale over [0, pi].
  magnitude = transforms.undo_squash_to_unit_interval(
      jnp.minimum(winds[..., 2], 1.0 - 1e-6), 30.0)

  distance = transforms.undo_squash_to_unit_interval(
      jnp.minimum(parsed.distance_to_station, 1.0 - 1e-6), 250.0)

  # Bearing weight ramps with distance (station_seeker_agent.py:163-171).
  coeff = jnp.clip((distance - CLOSE_BEARING) / (FAR_BEARING - CLOSE_BEARING),
                   0.0, 1.0)
  bearing_weight = CLOSE_BEARING_WEIGHT + coeff * (FAR_BEARING_WEIGHT -
                                                   CLOSE_BEARING_WEIGHT)
  alpha_delta = jnp.exp(-distance / HALF_RADIUS)

  magnitude_term = jnp.exp(-MAGNITUDE_WEIGHT * magnitude)
  bearing_term = jnp.exp(-bearing_weight[..., None] * bearing_rad)
  wind_score = ((1.0 - alpha_delta[..., None]) * bearing_term +
                alpha_delta[..., None] * magnitude_term)

  level_distance = jnp.abs(
      jnp.arange(2 * features_lib.NUM_PRESSURE_LEVELS - 1) - _MIDPOINT)
  hysteresis = HYSTERESIS_K2 * jnp.exp(-HYSTERESIS_K3 * level_distance)

  score = ((1.0 - uncertainty + CONFIDENCE_EPSILON) * wind_score +
           uncertainty * DEFAULT_SCORE + hysteresis)
  return jnp.where(valid, score, 0.0)


def pick_action(observation: jnp.ndarray) -> jnp.ndarray:
  """Best-level argmax -> UP/DOWN/STAY (station_seeker_agent.py:72-86)."""
  s = scores(observation)
  best = jnp.argmax(s, axis=-1)
  return jnp.where(best < _MIDPOINT, safety.UP,
                   jnp.where(best > _MIDPOINT, safety.DOWN, safety.STAY))


@base.register('station_seeker')
class StationSeekerAgent(base.FunctionalAgent):

  def __init__(self, num_actions, observation_shape, seed=None):
    super().__init__(
        num_actions, observation_shape,
        init_fn=lambda key: (),
        policy_fn=lambda state, obs, key: (state, pick_action(obs)),
        seed=seed)
