"""Eval harness tests: vectorized suite evaluation with station seeker +
random agents on the static field, suites, JSON output, collectors."""

import json
import os

import jax
import numpy as np
import pytest

from ble_tpu.agents import station_seeker
from ble_tpu.env import env as env_lib
from ble_tpu.metrics import collectors as collectors_lib
from ble_tpu.train import eval_lib
from ble_tpu.train import suites


def test_suites():
  assert suites.get_eval_suite('micro_eval').seeds == [0]
  assert len(suites.get_eval_suite('small_eval').seeds) == 100
  assert suites.get_eval_suite('big_eval').max_episode_length == 960
  strata = suites.get_eval_suite('hardest_strata')
  assert len(strata.seeds) == 2000
  assert strata.seeds[0] == 0 and strata.seeds[1] == 3
  with pytest.raises(ValueError):
    suites.get_eval_suite('nope')


@pytest.mark.slow
def test_eval_station_seeker_micro(tmp_path):
  env_params = env_lib.EnvParams()
  field_fn = env_lib.make_field_fn('static')
  policy_init = lambda key: ()
  policy_step = lambda state, obs, key: (state, station_seeker.pick_action(obs))
  eval_fn = eval_lib.build_eval_fn(env_params, field_fn, policy_init,
                                   policy_step, max_steps=40)
  results = eval_lib.evaluate(eval_fn, [0, 1, 2])
  assert len(results) == 3
  for r in results:
    assert 0.0 <= r.time_within_radius <= 1.0
    assert r.final_timestep <= 40
    assert np.isfinite(r.cumulative_reward)

  out = tmp_path / 'results.json'
  eval_lib.write_results_json(results, str(out), 'station_seeker', 'micro')
  payload = json.loads(out.read_text())
  assert payload['agent'] == 'station_seeker'
  assert len(payload['results']) == 3
  assert payload['results'][0]['seed'] == 0

  summary = eval_lib.summarize(results)
  assert summary['num_seeds'] == 3


@pytest.mark.slow
def test_eval_deterministic():
  env_params = env_lib.EnvParams()
  field_fn = env_lib.make_field_fn('static')
  policy_init = lambda key: ()
  policy_step = lambda state, obs, key: (state, station_seeker.pick_action(obs))
  eval_fn = eval_lib.build_eval_fn(env_params, field_fn, policy_init,
                                   policy_step, max_steps=20)
  r1 = eval_lib.evaluate(eval_fn, [5])
  r2 = eval_lib.evaluate(eval_fn, [5])
  assert r1[0].cumulative_reward == r2[0].cumulative_reward
  assert r1[0].time_within_radius == r2[0].time_within_radius


def test_combine_shards(tmp_path):
  env_params = env_lib.EnvParams()
  del env_params
  fake = [eval_lib.EvaluationResult(seed=s, cumulative_reward=float(s),
                                    time_within_radius=0.5, out_of_power=False,
                                    envelope_burst=False, zeropressure=False,
                                    final_timestep=10) for s in (3, 1)]
  p1 = tmp_path / 'shard0.json'
  eval_lib.write_results_json(fake, str(p1), 'a', 's')
  fake2 = [eval_lib.EvaluationResult(seed=2, cumulative_reward=2.0,
                                     time_within_radius=0.5,
                                     out_of_power=False, envelope_burst=False,
                                     zeropressure=False, final_timestep=10)]
  p2 = tmp_path / 'shard1.json'
  eval_lib.write_results_json(fake2, str(p2), 'a', 's')
  combined = eval_lib.combine_shard_results([str(p1), str(p2)])
  assert [r['seed'] for r in combined] == [1, 2, 3]


def test_collectors(tmp_path, capsys):
  dispatcher = collectors_lib.CollectorDispatcher(
      str(tmp_path), 3, ['console', 'pickle'])
  dispatcher.pre_training()
  for ep in range(2):
    dispatcher.begin_episode()
    for t in range(3):
      dispatcher.step(collectors_lib.StatisticsInstance(
          step=t, action=np.asarray([0, 1, 2]),
          reward=np.asarray([0.5, 0.2, 0.9]), terminal=np.zeros(3, bool)))
    dispatcher.end_episode(collectors_lib.StatisticsInstance(
        step=3, action=np.asarray([1, 1, 1]),
        reward=np.asarray([1.0, 1.0, 1.0]), terminal=np.ones(3, bool)))
  dispatcher.end_training()
  out = capsys.readouterr().out
  assert '[episode 0]' in out and '[episode 1]' in out
  pickles = list((tmp_path / 'metrics' / 'pickle').glob('*.pkl'))
  assert len(pickles) == 2
