"""Combines the QR-DQN training runs into one flagship learning-curve
figure + a trajectory summary (the VERDICT "reach 0.8 or commit a
plateau analysis" artifact).

  python tools/flagship_curve.py  # writes results/flagship_curve.png/.json
"""

import json
import os
import sys

import numpy as np

RUNS = [
    ('round 3 (42 iters, wall-capped)', 'results/qrdqn_long_run/curve.jsonl'),
    ('round 4a (tunnel-stalled at 39)', 'results/qrdqn_long_run_r4/curve.jsonl'),
    ('round 4b (wall-capped)', 'results/qrdqn_long_run_r4b/curve.jsonl'),
]


def load(path):
  rows = []
  baseline = None
  with open(path) as f:
    for line in f:
      d = json.loads(line)
      if 'baseline' in d:
        baseline = d['baseline'].get('station_seeker_mean_twr')
      elif 'eval_mean_twr' in d:
        rows.append((d['env_steps'] / 1e6, d['eval_mean_twr']))
  return baseline, rows


def main():
  import matplotlib
  matplotlib.use('Agg')
  import matplotlib.pyplot as plt

  fig, ax = plt.subplots(figsize=(8, 5))
  summary = {'runs': []}
  baseline = None
  for label, path in RUNS:
    if not os.path.exists(path):
      continue
    b, rows = load(path)
    baseline = baseline or b
    if not rows:
      continue
    xs, ys = zip(*rows)
    ax.plot(xs, ys, marker='o', ms=3, label=label)
    summary['runs'].append({
        'label': label, 'path': path,
        'final_env_steps_M': round(xs[-1], 1),
        'final_eval_twr': round(ys[-1], 4),
        'best_eval_twr': round(max(ys), 4),
        # Slope over the last 3 eval points (TWR per 10M steps): the
        # plateau test — ~0 means converged, >0 means wall-capped.
        'tail_slope_per_10M': round(
            float(np.polyfit(xs[-3:], ys[-3:], 1)[0] * 10), 4)
        if len(xs) >= 3 else None,
    })
  if baseline:
    ax.axhline(baseline, color='k', ls='--', lw=1,
               label=f'StationSeeker ({baseline:.3f})')
  ax.axhline(0.8, color='tab:red', ls=':', lw=1, label='Perciatelli44 (~0.8)')
  ax.set_xlabel('env steps [M]')
  ax.set_ylabel('eval TWR (100-seed suite)')
  ax.set_title('QR-DQN learning curves (1024 envs, one chip)')
  ax.legend(loc='lower right', fontsize=8)
  fig.tight_layout()
  fig.savefig('results/flagship_curve.png', dpi=120)
  with open('results/flagship_curve.json', 'w') as f:
    json.dump(summary, f, indent=1)
  print(json.dumps(summary, indent=1))


if __name__ == '__main__':
  main()
