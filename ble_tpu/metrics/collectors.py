"""Metric collectors: console / pickle / tensorboard, with a dispatcher.

Counterpart of the reference ``metrics/`` package (collector.py:39-86,
collector_dispatcher.py:62-99, console/pickle/tensorboard collectors).
Statistics arrive as batched arrays (the vectorized harness reports whole
env-batches per step); per-env streams are also supported with batch
size 1.
"""

import dataclasses
import os
import pickle
from typing import List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class StatisticsInstance:
  """Per-step statistics (reference statistics_instance.py:22).

  The vectorized harness reports one instance per lockstep batch step:
  `action_histogram` carries the (num_actions,) action counts over live
  envs (cheaper than shipping the full (E,) action array off-device) and
  `terminal` the count of envs that terminated this step.
  """
  step: int
  action: np.ndarray  # (E,) or scalar
  reward: np.ndarray
  terminal: np.ndarray
  action_histogram: Optional[np.ndarray] = None  # (num_actions,) counts


class Collector:
  """Lifecycle hooks (reference collector.py:39-86)."""

  def __init__(self, base_dir: Optional[str], num_actions: int,
               current_episode: int = 0):
    if base_dir is not None:
      self._base_dir = os.path.join(base_dir, 'metrics', self.get_name())
      os.makedirs(self._base_dir, exist_ok=True)
    else:
      self._base_dir = None
    self._num_actions = num_actions

  def get_name(self) -> str:
    raise NotImplementedError

  def pre_training(self) -> None:
    pass

  def begin_episode(self) -> None:
    pass

  def step(self, statistics: StatisticsInstance) -> None:
    pass

  def end_episode(self, statistics: StatisticsInstance) -> None:
    pass

  def end_training(self) -> None:
    pass


class ConsoleCollector(Collector):
  """Running reward + action histogram (reference console_collector.py)."""

  def get_name(self) -> str:
    return 'console'

  def pre_training(self) -> None:
    self._episode = 0

  def begin_episode(self) -> None:
    self._reward = 0.0
    self._action_counts = np.zeros(self._num_actions, np.int64)
    self._steps = 0

  def step(self, statistics: StatisticsInstance) -> None:
    self._reward += float(np.mean(statistics.reward))
    if statistics.action_histogram is not None:
      self._action_counts += np.asarray(statistics.action_histogram,
                                        np.int64)
    else:
      actions = np.atleast_1d(np.asarray(statistics.action))
      for a in range(self._num_actions):
        self._action_counts[a] += int(np.sum(actions == a))
    self._steps += 1

  def end_episode(self, statistics: StatisticsInstance) -> None:
    self.step(statistics)
    total = max(self._action_counts.sum(), 1)
    hist = ', '.join(f'{a}: {c / total:.2f}'
                     for a, c in enumerate(self._action_counts))
    print(f'[episode {self._episode}] steps={self._steps} '
          f'mean_reward={self._reward:.3f} actions=({hist})')
    self._episode += 1


class PickleCollector(Collector):
  """Per-episode pickle dumps (reference pickle_collector.py)."""

  def __init__(self, base_dir: Optional[str], num_actions: int,
               current_episode: int = 0):
    if base_dir is None:
      raise ValueError('PickleCollector requires a base directory.')
    super().__init__(base_dir, num_actions, current_episode)
    self._episode = current_episode

  def get_name(self) -> str:
    return 'pickle'

  def begin_episode(self) -> None:
    self._stats: List[StatisticsInstance] = []

  def step(self, statistics: StatisticsInstance) -> None:
    self._stats.append(statistics)

  def end_episode(self, statistics: StatisticsInstance) -> None:
    self._stats.append(statistics)
    path = os.path.join(self._base_dir, f'episode_{self._episode:06d}.pkl')
    with open(path, 'wb') as f:
      pickle.dump(self._stats, f)
    self._episode += 1


class TensorboardCollector(Collector):
  """Episode reward/length summaries (reference tensorboard_collector.py)."""

  def __init__(self, base_dir: Optional[str], num_actions: int,
               current_episode: int = 0):
    if base_dir is None:
      raise ValueError('TensorboardCollector requires a base directory.')
    super().__init__(base_dir, num_actions, current_episode)
    from flax.metrics import tensorboard
    self._writer = tensorboard.SummaryWriter(self._base_dir)
    self._episode = current_episode
    self._global_step = 0

  def get_name(self) -> str:
    return 'tensorboard'

  def begin_episode(self) -> None:
    self._reward = 0.0
    self._steps = 0

  def step(self, statistics: StatisticsInstance) -> None:
    self._reward += float(np.mean(statistics.reward))
    self._steps += 1
    self._global_step += 1

  def end_episode(self, statistics: StatisticsInstance) -> None:
    self.step(statistics)
    self._writer.scalar('Train/EpisodeReward', self._reward, self._episode)
    self._writer.scalar('Train/EpisodeLength', self._steps, self._episode)
    self._writer.flush()
    self._episode += 1


AVAILABLE_COLLECTORS = {
    'console': ConsoleCollector,
    'pickle': PickleCollector,
    'tensorboard': TensorboardCollector,
}


class CollectorDispatcher:
  """Fans lifecycle calls out to collectors
  (reference collector_dispatcher.py:62-99)."""

  def __init__(self, base_dir: Optional[str], num_actions: int,
               collectors: Sequence[str], current_episode: int = 0):
    self._collectors = []
    for name in collectors:
      if name not in AVAILABLE_COLLECTORS:
        raise ValueError(f'Unknown collector: {name}')
      self._collectors.append(
          AVAILABLE_COLLECTORS[name](base_dir, num_actions, current_episode))

  def pre_training(self) -> None:
    for c in self._collectors:
      c.pre_training()

  def begin_episode(self) -> None:
    for c in self._collectors:
      c.begin_episode()

  def step(self, statistics: StatisticsInstance) -> None:
    for c in self._collectors:
      c.step(statistics)

  def end_episode(self, statistics: StatisticsInstance) -> None:
    for c in self._collectors:
      c.end_episode(statistics)

  def end_training(self) -> None:
    for c in self._collectors:
      c.end_training()
