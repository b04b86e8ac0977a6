"""Shim of the tfp-on-jax surface used by the reference.

Exactly two sampling constructions appear on the reference's environment
path (reference utils/sampling.py:136-147):

  tfp.distributions.LogitNormal(2, 315).sample(seed=key)
  tfp.distributions.TransformedDistribution(
      tfp.distributions.LogNormal(0.0, 1.0),
      bijector=tfp.bijectors.Chain([Shift(-300.9568), Scale(35),
                                    Power(0.68)])).sample(seed=key)

tfp samples the base normal via jax.random.normal(key, shape), so these
shims reproduce the real library's draws for the same key (validated in
tests/test_reference_parity.py::test_sampling_distributions against
ble_tpu's own samplers, which were independently calibrated in round 1).
"""

from . import bijectors
from . import distributions

__all__ = ['bijectors', 'distributions']
