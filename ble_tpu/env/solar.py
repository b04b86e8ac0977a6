"""Solar elevation/azimuth/flux, panel power, and sunrise/sunset.

TPU-native counterpart of the reference ``env/balloon/solar.py``:

  - `solar_calculator` is the same NOAA solar-position model
    (solar.py:43-174) written branchlessly over jnp arrays, taking
    (lat_rad, lng_rad, unix_seconds) instead of (s2.LatLng, datetime).
  - `next_sunrise_sunset` replaces the lazy-sequence binary search
    (solar.py:258-483) with a vectorized scan of the next 24 h of solar
    elevations at the same 3-minute resolution; crossings of
    MIN_SOLAR_EL_DEG give sunrise/sunset, so answers agree with the
    reference up to its own search resolution.
"""

import math

import jax.numpy as jnp

from ble_tpu.ops import pmath
from ble_tpu.utils import time_lib

# Min elevation at which panels see the sun (reference solar.py:38).
MIN_SOLAR_EL_DEG = -4.242
SEARCH_STEP_SECONDS = 180  # 3-minute search resolution (solar.py:39).

_BALLOON_RADIUS = 8.69275
_BALLOON_HEIGHT = 10.41603
# Shadow cutoff elevations are constants per panel mount height
# (reference solar.py:212-236).
_SHADOW_EL_DEG_3_3 = math.degrees(
    math.atan2(math.sqrt(3.3 * (_BALLOON_HEIGHT + 3.3)), _BALLOON_RADIUS))
_SHADOW_EL_DEG_2_7 = math.degrees(
    math.atan2(math.sqrt(2.7 * (_BALLOON_HEIGHT + 2.7)), _BALLOON_RADIUS))
_SHADOW_FACTOR = 0.4392


def solar_calculator(lat_rad, lng_rad, time_s):
  """Solar (elevation_deg, azimuth_deg, flux_w_m2) at a location and time.

  All inputs broadcast; `time_s` is int32 unix seconds UTC.
  """
  jd_j2000, fraction_of_day = time_lib.days_from_j2000(time_s)
  julian_century = jd_j2000 / 36525.0

  geometric_mean_long_sun = jnp.radians(
      280.46646 + julian_century * (36000.76983 + julian_century * 0.0003032))
  sin2l0 = jnp.sin(2.0 * geometric_mean_long_sun)
  cos2l0 = jnp.cos(2.0 * geometric_mean_long_sun)
  sin4l0 = jnp.sin(4.0 * geometric_mean_long_sun)

  geometric_mean_anomaly_sun = jnp.radians(
      357.52911 + julian_century * (35999.05029 - 0.0001537 * julian_century))
  sinm0 = jnp.sin(geometric_mean_anomaly_sun)
  sin2m0 = jnp.sin(2.0 * geometric_mean_anomaly_sun)
  sin3m0 = jnp.sin(3.0 * geometric_mean_anomaly_sun)

  mean_obliquity_of_ecliptic = jnp.radians(23.0 + (26.0 + (
      (21.448 - julian_century *
       (46.815 + julian_century *
        (0.00059 - julian_century * 0.001813)))) / 60.0) / 60.0)

  obliquity_correction = mean_obliquity_of_ecliptic + jnp.radians(
      0.00256 * jnp.cos(jnp.radians(125.04 - 1934.136 * julian_century)))

  var_y = pmath.tan(obliquity_correction / 2.0) ** 2

  eccentricity_earth = 0.016708634 - julian_century * (
      0.000042037 + 0.0000001267 * julian_century)

  equation_of_time = (4.0 *
                      (var_y * sin2l0 - 2.0 * eccentricity_earth * sinm0 +
                       4.0 * eccentricity_earth * var_y * sinm0 * cos2l0 -
                       0.5 * var_y * var_y * sin4l0 -
                       1.25 * eccentricity_earth * eccentricity_earth * sin2m0))

  hour_angle_arg = pmath.fmod(
      1440.0 * fraction_of_day + jnp.degrees(equation_of_time) +
      4.0 * jnp.degrees(lng_rad), 1440.0)
  hour_angle = jnp.radians(hour_angle_arg) / 4.0
  hour_angle = jnp.where(hour_angle < 0, hour_angle + jnp.pi,
                         hour_angle - jnp.pi)

  eq_of_center_sun = jnp.radians(sinm0 *
                                 (1.914602 - julian_century *
                                  (0.004817 + 0.000014 * julian_century)) +
                                 sin2m0 *
                                 (0.019993 - 0.000101 * julian_century) +
                                 sin3m0 * 0.000289)
  true_long_sun = geometric_mean_long_sun + eq_of_center_sun
  apparent_long_sun = true_long_sun - jnp.radians(
      0.00569 -
      0.00478 * jnp.sin(jnp.radians(125.04 - 1934.136 * julian_century)))
  declination_sun = pmath.asin(
      jnp.sin(obliquity_correction) * jnp.sin(apparent_long_sun))

  cos_zenith = (jnp.sin(lat_rad) * jnp.sin(declination_sun) +
                jnp.cos(lat_rad) * jnp.cos(declination_sun) *
                jnp.cos(hour_angle))
  zenith_angle = pmath.acos(jnp.clip(cos_zenith, -1.0, 1.0))

  el_uncorrected_deg = 90.0 - jnp.degrees(zenith_angle)

  # Atmospheric refraction, 4-branch piecewise (reference solar.py:143-157).
  tan_seu = pmath.tan(jnp.radians(el_uncorrected_deg))
  safe_tan = jnp.where(jnp.abs(tan_seu) < 1e-8,
                       jnp.where(tan_seu < 0, -1e-8, 1e-8), tan_seu)
  refr_high = 58.1 / safe_tan - 0.07 / safe_tan ** 3 + 0.000086 / safe_tan ** 5
  refr_mid = (1735.0 + el_uncorrected_deg *
              (-518.2 + el_uncorrected_deg *
               (103.4 + el_uncorrected_deg *
                (-12.79 + el_uncorrected_deg * 0.711))))
  refr_low = -20.772 / safe_tan
  atmospheric_refraction = jnp.where(
      el_uncorrected_deg > 85.0, 0.0,
      jnp.where(el_uncorrected_deg > 5.0, refr_high,
                jnp.where(el_uncorrected_deg > -0.575, refr_mid, refr_low)))

  el_deg = el_uncorrected_deg + atmospheric_refraction / 3600.0

  # Azimuth (reference solar.py:159-167). Guard the sin(zenith)=0 poles.
  sin_zenith = jnp.sin(zenith_angle)
  denom = jnp.cos(lat_rad) * jnp.where(sin_zenith < 1e-8, 1e-8, sin_zenith)
  cos_az = ((jnp.sin(lat_rad) * jnp.cos(zenith_angle) -
             jnp.sin(declination_sun)) / denom)
  az_unwrapped = pmath.acos(jnp.clip(cos_az, -1.0, 1.0))
  az_deg = jnp.where(hour_angle > 0,
                     jnp.degrees(az_unwrapped) + 180.0,
                     180.0 - jnp.degrees(az_unwrapped))

  flux = 1366.0 * (1 + 0.5 * (
      ((1 + eccentricity_earth) /
       (1 - eccentricity_earth)) ** 2 - 1) * jnp.cos(geometric_mean_anomaly_sun))

  return el_deg, az_deg, flux


def solar_atmospheric_attenuation(el_deg, pressure_pa):
  """Attenuation factor in [0, 1] (reference solar.py:177-209)."""
  tmp_sin_elev = 614.0 * jnp.sin(jnp.radians(el_deg))
  airmass = (0.34764 * (pressure_pa / 101325.0) *
             (jnp.sqrt(1229.0 + tmp_sin_elev * tmp_sin_elev) - tmp_sin_elev))
  attenuation = 0.5 * (jnp.exp(-0.65 * airmass) + jnp.exp(-0.95 * airmass))
  return jnp.where(el_deg < MIN_SOLAR_EL_DEG, 0.0, attenuation)


def balloon_shadow(el_deg, shadow_el_deg: float):
  """Shadow factor for a panel with the given cutoff (solar.py:212-236)."""
  return jnp.where(el_deg >= shadow_el_deg, _SHADOW_FACTOR, 1.0)


def solar_power(el_deg, pressure_pa):
  """Panel power [W]: 4x210W @35deg + 2x210W @65deg (solar.py:515-536)."""
  attenuation = solar_atmospheric_attenuation(el_deg, pressure_pa)
  power = 210.0 * attenuation * (
      4 * jnp.cos(jnp.radians(el_deg - 35)) *
      balloon_shadow(el_deg, _SHADOW_EL_DEG_3_3) +
      2 * jnp.cos(jnp.radians(el_deg - 65)) *
      balloon_shadow(el_deg, _SHADOW_EL_DEG_2_7))
  return power


def next_sunrise_sunset(lat_rad, lng_rad, time_s, num_steps: int = 482):
  """Next sunrise and sunset times after `time_s` (int32 unix seconds).

  Scans solar elevation over the next ~24 h at 3-minute resolution, finds
  the first upward / downward crossings of MIN_SOLAR_EL_DEG, then refines
  each crossing inside its bracket with a linear-interpolation root plus
  one secant step (elevation is smooth and nearly linear over 3 min, so
  this lands within seconds of the true crossing — the reference instead
  bisects lazily to 1-minute precision, solar.py:258-483). Inputs may
  have a leading batch shape; the scan axis is appended internally.

  Returns:
    (sunrise_s, sunset_s): int32 arrays, each strictly after `time_s`
    (within one day plus search slack, mirroring reference
    solar.py:432-483 semantics).
  """
  time_s = jnp.asarray(time_s, jnp.int32)
  offsets = jnp.arange(1, num_steps + 1, dtype=jnp.int32) * SEARCH_STEP_SECONDS
  grid_t = time_s[..., None] + offsets  # (..., num_steps)
  lat_rad = jnp.asarray(lat_rad, jnp.float32)
  lng_rad = jnp.asarray(lng_rad, jnp.float32)
  el, _, _ = solar_calculator(lat_rad[..., None], lng_rad[..., None], grid_t)
  is_day = el >= MIN_SOLAR_EL_DEG

  el_now, _, _ = solar_calculator(lat_rad, lng_rad, time_s)
  day_now = el_now >= MIN_SOLAR_EL_DEG

  prev_day = jnp.concatenate([jnp.broadcast_to(day_now[..., None],
                                               is_day[..., :1].shape),
                              is_day[..., :-1]], axis=-1)
  rise_cross = jnp.logical_and(is_day, jnp.logical_not(prev_day))
  set_cross = jnp.logical_and(jnp.logical_not(is_day), prev_day)

  el_prev = jnp.concatenate([el_now[..., None], el[..., :-1]], axis=-1)

  def first_time(cross):
    any_cross = jnp.any(cross, axis=-1)
    idx = jnp.argmax(cross, axis=-1)[..., None]
    # All interpolation happens in OFFSET space (seconds since time_s):
    # absolute unix times overflow f32 resolution (~128 s at 1.6e9).
    t1_off = ((idx[..., 0] + 1) * SEARCH_STEP_SECONDS).astype(jnp.float32)
    t0_off = t1_off - SEARCH_STEP_SECONDS
    e1 = jnp.take_along_axis(el, idx, axis=-1)[..., 0]
    e0 = jnp.take_along_axis(el_prev, idx, axis=-1)[..., 0]
    # Linear root in the bracket, then one secant update with a fresh
    # elevation evaluation at the interpolated point.
    denom = jnp.where(jnp.abs(e1 - e0) < 1e-9, 1e-9, e1 - e0)
    lin_off = t0_off + (MIN_SOLAR_EL_DEG - e0) / denom * (t1_off - t0_off)
    t_lin = time_s + jnp.round(lin_off).astype(jnp.int32)
    e_lin, _, _ = solar_calculator(lat_rad, lng_rad, t_lin)
    denom2 = jnp.where(jnp.abs(e1 - e_lin) < 1e-9, 1e-9, e1 - e_lin)
    ref_off = lin_off + ((MIN_SOLAR_EL_DEG - e_lin) / denom2 *
                         (t1_off - lin_off))
    ref_off = jnp.clip(ref_off, t0_off, t1_off)
    t = time_s + jnp.round(ref_off).astype(jnp.int32)
    # No crossing within the window (polar day/night): fall back to +24 h.
    return jnp.where(any_cross, t, time_s + 86400)

  return first_time(rise_cross), first_time(set_cross)
