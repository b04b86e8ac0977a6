from . import jax  # noqa: F401
