"""gym 0.21-style registration API over gymnasium's registry.

The reference checks `registration.registry.env_specs` before calling
`registration.register` (reference env/gym.py:24-40); gymnasium renamed
the registry to a plain dict, so this adapter restores the old attribute.
"""

from gymnasium.envs import registration as _gymn


class _Registry:

  @property
  def env_specs(self):
    return _gymn.registry


registry = _Registry()


def register(**kwargs):
  return _gymn.register(**kwargs)
