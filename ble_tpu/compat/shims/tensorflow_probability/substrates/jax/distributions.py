"""Sampling-only distribution shims over jax.random.

Only `.sample(seed=key)` is exercised by the reference's environment path
(utils/sampling.py:136-147). Like real tfp, the base standard normal is
drawn with jax.random.normal(key, shape, dtype=float32).
"""

import jax
import jax.numpy as jnp


class _Sampler:

  def sample(self, sample_shape=(), seed=None):
    raise NotImplementedError


class Normal(_Sampler):

  def __init__(self, loc, scale):
    self.loc = loc
    self.scale = scale

  def sample(self, sample_shape=(), seed=None):
    z = jax.random.normal(seed, shape=tuple(sample_shape))
    return self.loc + self.scale * z


class LogNormal(_Sampler):

  def __init__(self, loc, scale):
    self.loc = loc
    self.scale = scale

  def sample(self, sample_shape=(), seed=None):
    z = jax.random.normal(seed, shape=tuple(sample_shape))
    return jnp.exp(self.loc + self.scale * z)


class LogitNormal(_Sampler):

  def __init__(self, loc, scale):
    self.loc = loc
    self.scale = scale

  def sample(self, sample_shape=(), seed=None):
    z = jax.random.normal(seed, shape=tuple(sample_shape))
    return jax.nn.sigmoid(self.loc + self.scale * z)


class TransformedDistribution(_Sampler):

  def __init__(self, distribution, bijector):
    self.distribution = distribution
    self.bijector = bijector

  def sample(self, sample_shape=(), seed=None):
    return self.bijector.forward(
        self.distribution.sample(sample_shape, seed=seed))
