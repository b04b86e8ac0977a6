"""Absolute-time arithmetic on device.

The reference keeps `datetime.datetime` objects in the balloon state and
does calendar math per physics substep (reference
``env/balloon/balloon.py:546``, ``env/balloon/solar.py:66-79``). On TPU we
represent absolute time as **int32 unix seconds (UTC)** so that all time
updates are exact integer adds, and derive calendar quantities (year,
month, day, second-of-day) with branchless integer arithmetic when the
solar model needs them.

The Gregorian conversion is the standard civil-from-days algorithm
(Howard Hinnant's `civil_from_days`), valid far beyond the 2011-2014
simulation window.
"""

import datetime as dt

import jax.numpy as jnp


def unix_seconds_from_datetime(d: dt.datetime) -> int:
  """Host-side helper: tz-aware datetime -> int unix seconds."""
  if d.tzinfo is None:
    d = d.replace(tzinfo=dt.timezone.utc)
  return int(d.timestamp())


def datetime_from_unix_seconds(s: int) -> dt.datetime:
  return dt.datetime.fromtimestamp(int(s), tz=dt.timezone.utc)


def civil_from_unix_seconds(time_s):
  """Vectorized (year, month, day, second_of_day) from unix seconds.

  Args:
    time_s: int32 array of unix seconds (must be >= 0).

  Returns:
    Tuple of int32 arrays (year, month, day, second_of_day).
  """
  time_s = jnp.asarray(time_s, jnp.int32)
  days = time_s // 86400
  second_of_day = time_s - days * 86400

  # civil_from_days (Hinnant). days are since 1970-01-01.
  z = days + 719468
  era = jnp.where(z >= 0, z, z - 146096) // 146097
  doe = z - era * 146097  # [0, 146096]
  yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
  y = yoe + era * 400
  doy = doe - (365 * yoe + yoe // 4 - yoe // 100)  # [0, 365]
  mp = (5 * doy + 2) // 153  # [0, 11]
  day = doy - (153 * mp + 2) // 5 + 1  # [1, 31]
  month = jnp.where(mp < 10, mp + 3, mp - 9)  # [1, 12]
  year = jnp.where(month <= 2, y + 1, y)
  return year, month, day, second_of_day


def days_from_j2000(time_s):
  """Float32 julian days since J2000 epoch (JD 2451545.0 = 2000-01-01 12:00 UT).

  Matches the reference's julian-day construction
  (``env/balloon/solar.py:66-79``) but keeps the large integer parts exact:
  the integer julian-day-number terms are combined before subtracting the
  J2000 offset, so float32 only ever sees O(5000-day) magnitudes.

  Returns:
    (jd_minus_j2000, fraction_of_day): both float32. `fraction_of_day` is
    the [0, 1) fraction of the UTC day, returned separately because the
    hour angle needs it at full precision.
  """
  year, month, day, second_of_day = civil_from_unix_seconds(time_s)
  yf = year.astype(jnp.float32)
  mf = month.astype(jnp.float32)

  # Reference formula terms (all integer-valued, exactly representable in
  # f32 for |value| < 2^24).
  t1 = 367.0 * yf
  t2 = jnp.floor(7.0 * (yf + jnp.floor((mf + 9.0) / 12.0)) / 4.0)
  t3 = jnp.floor(3.0 * (jnp.floor((yf + (mf - 9.0) / 7.0) / 100.0) + 1.0) /
                 4.0)
  t4 = jnp.floor(275.0 * mf / 9.0)
  # julian_day_number = t1 - t2 - t3 + t4 + day + 1721028.5
  # jd_minus_j2000 at 0h UT = julian_day_number - 2451545.0
  #                        = (t1 - t2 - t3 + t4 + day) - 730516.5
  int_part = t1 - t2 - t3 + t4 + day.astype(jnp.float32)
  fraction_of_day = second_of_day.astype(jnp.float32) / 86400.0
  jd_minus_j2000 = (int_part - 730516.5) + fraction_of_day
  return jd_minus_j2000, fraction_of_day
