"""Forward-only bijectors used by reference utils/sampling.py:143-146."""


class Bijector:

  def forward(self, x):
    raise NotImplementedError


class Shift(Bijector):

  def __init__(self, shift):
    self.shift = shift

  def forward(self, x):
    return x + self.shift


class Scale(Bijector):

  def __init__(self, scale):
    self.scale = scale

  def forward(self, x):
    return x * self.scale


class Power(Bijector):

  def __init__(self, power):
    self.power = power

  def forward(self, x):
    return x ** self.power


class Chain(Bijector):
  """Composition; like tfp, applies bijectors RIGHT to LEFT."""

  def __init__(self, bijectors):
    self.bijectors = list(bijectors)

  def forward(self, x):
    for b in reversed(self.bijectors):
      x = b.forward(x)
    return x


class Sigmoid(Bijector):

  def forward(self, x):
    import jax
    return jax.nn.sigmoid(x)
