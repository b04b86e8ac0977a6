"""ble_tpu: a TPU-native Balloon Learning Environment.

A from-scratch JAX/XLA re-design of the capabilities of
google/balloon-learning-environment (reference layout documented in
/root/repo/SURVEY.md). The environment is a pure function
``step(state, action) -> (state, obs, reward, done, info)`` over
struct-of-array pytrees, vmappable to thousands of balloons per chip and
shardable over a `jax.sharding.Mesh` for multi-host training.
"""

__version__ = "0.1.0"
