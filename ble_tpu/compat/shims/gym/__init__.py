"""gym shim re-exporting gymnasium (installed) under the legacy name.

The reference targets gym 0.21 and uses only `gym.Env`, `gym.Space`,
`gym.spaces.{Box,Discrete}`, and the registration helpers (reference
env/balloon_env.py:106-267, env/features.py:143-348, setup.py:87-90).
Gymnasium's versions of these are API-compatible for that surface.
"""

from gymnasium import Env
from gymnasium import Space
from gymnasium import spaces
from gymnasium import Wrapper
from gymnasium.envs.registration import register

__all__ = ['Env', 'Space', 'spaces', 'Wrapper', 'register']
