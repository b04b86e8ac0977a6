"""Minimal s2sphere shim: the LatLng value type.

The reference uses exactly `s2.LatLng` (from_degrees / from_radians /
lat() / lng() / normalized()); see e.g. reference utils/sampling.py:37-62
and utils/spherical_geometry.py:39-76. Angles expose `.degrees` and
`.radians` like the real s2sphere.Angle.
"""

import math


class Angle:
  __slots__ = ('_radians',)

  def __init__(self, radians: float = 0.0):
    self._radians = float(radians)

  @classmethod
  def from_degrees(cls, degrees: float) -> 'Angle':
    return cls(math.radians(degrees))

  @classmethod
  def from_radians(cls, radians: float) -> 'Angle':
    return cls(radians)

  @property
  def radians(self) -> float:
    return self._radians

  @property
  def degrees(self) -> float:
    return math.degrees(self._radians)

  def __eq__(self, other):
    return isinstance(other, Angle) and self._radians == other._radians

  def __repr__(self):
    return f'Angle({self.degrees} degrees)'


class LatLng:
  __slots__ = ('_lat', '_lng')

  def __init__(self, lat: Angle, lng: Angle):
    self._lat = lat
    self._lng = lng

  @classmethod
  def from_degrees(cls, lat: float, lng: float) -> 'LatLng':
    return cls(Angle.from_degrees(lat), Angle.from_degrees(lng))

  @classmethod
  def from_radians(cls, lat: float, lng: float) -> 'LatLng':
    return cls(Angle.from_radians(lat), Angle.from_radians(lng))

  def lat(self) -> Angle:
    return self._lat

  def lng(self) -> Angle:
    return self._lng

  def normalized(self) -> 'LatLng':
    """Clamps latitude to [-90, 90] deg; wraps longitude to [-180, 180]."""
    lat = max(-math.pi / 2.0, min(math.pi / 2.0, self._lat.radians))
    lng = math.remainder(self._lng.radians, 2.0 * math.pi)
    return LatLng(Angle(lat), Angle(lng))

  def is_valid(self) -> bool:
    return (abs(self._lat.radians) <= math.pi / 2.0 and
            abs(self._lng.radians) <= math.pi)

  def __eq__(self, other):
    return (isinstance(other, LatLng) and self._lat == other._lat and
            self._lng == other._lng)

  def __repr__(self):
    return f'LatLng({self._lat.degrees}, {self._lng.degrees})'
