"""Evaluation suites (reference eval/suites.py:23-63).

Seed lists are identical to the reference; the difficulty-stratified seed
lists (measured by StationSeeker TWR on the generative field, reference
eval/strata_seeds.py) are shipped as a JSON data file.
"""

import dataclasses
import functools
import json
import os
from typing import List, Sequence

_STRATA_PATH = os.path.join(os.path.dirname(__file__), 'strata_seeds.json')


@dataclasses.dataclass
class EvaluationSuite:
  seeds: Sequence[int]
  max_episode_length: int


@functools.lru_cache(maxsize=1)
def _strata_seeds():
  with open(_STRATA_PATH) as f:
    return json.load(f)


def _suites():
  suites = {
      'big_eval': EvaluationSuite(list(range(10_000)), 960),
      'medium_eval': EvaluationSuite(list(range(1_000)), 960),
      'small_eval': EvaluationSuite(list(range(100)), 960),
      'tiny_eval': EvaluationSuite(list(range(10)), 960),
      'micro_eval': EvaluationSuite([0], 960),
  }
  strata = _strata_seeds()
  all_strata = []
  for name in ['hardest', 'hard', 'mid', 'easy', 'easiest']:
    suites[f'{name}_strata'] = EvaluationSuite(list(strata[name]), 960)
    all_strata += list(strata[name])
  suites['all_strata'] = EvaluationSuite(all_strata, 960)
  return suites


def available_suites() -> List[str]:
  return list(_suites())


def get_eval_suite(name: str) -> EvaluationSuite:
  suites = _suites()
  if name not in suites:
    raise ValueError(f'Unknown eval suite {name}')
  suite = suites[name]
  return EvaluationSuite(list(suite.seeds), suite.max_episode_length)
