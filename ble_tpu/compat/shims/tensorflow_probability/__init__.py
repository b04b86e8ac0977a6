"""tensorflow_probability shim (jax substrate only) — see substrates/jax."""

from . import substrates  # noqa: F401
