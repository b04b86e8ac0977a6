"""Minimal `transitions` shim: Machine with first-match trigger semantics.

Supports exactly what the reference safety layers use (reference
env/balloon/altitude_safety.py:49-70, envelope_safety.py:51-105):
`Machine(states=EnumClass, transitions=(dict(trigger=, source=, dest=),...),
initial=state)` with no model argument — the machine itself carries the
trigger methods and the `.state` attribute. Transitions are matched in
declaration order; `source` may be '*', a single state, or a tuple/list.
"""


class MachineError(Exception):
  pass


class Machine:

  def __init__(self, model=None, states=None, transitions=None,
               initial=None, **kwargs):
    del kwargs  # Accept & ignore the real library's many options.
    if states is not None and hasattr(states, '__members__'):
      self._states = list(states.__members__.values())
    else:
      self._states = list(states or [])
    self._transitions = [dict(t) for t in (transitions or [])]
    self._model = model if model is not None else self
    self.state = initial

    triggers = {t['trigger'] for t in self._transitions}
    for name in triggers:
      setattr(self._model, name, _Trigger(self, name))
    if self._model is not self:
      self._model.state = initial

  def _fire(self, trigger: str) -> bool:
    current = self._model.state if self._model is not self else self.state
    for t in self._transitions:
      if t['trigger'] != trigger:
        continue
      source = t['source']
      if source == '*':
        match = True
      elif isinstance(source, (tuple, list, set, frozenset)):
        match = current in source
      else:
        match = current == source
      if match:
        self.state = t['dest']
        if self._model is not self:
          self._model.state = t['dest']
        return True
    raise MachineError(
        f"Can't trigger event {trigger} from state {current}!")


class _Trigger:
  """Bound trigger callable (so Machine attrs stay picklable/copyable)."""

  __slots__ = ('_machine', '_name')

  def __init__(self, machine: Machine, name: str):
    self._machine = machine
    self._name = name

  def __call__(self, *args, **kwargs):
    del args, kwargs
    return self._machine._fire(self._name)
