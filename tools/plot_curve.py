"""Plots the QR-DQN learning curve (eval TWR vs env steps) from a
curve.jsonl produced by examples/train_learning_curve.py — the rebuild's
counterpart of the reference's docs/imgs/training_curve.jpg.

Usage: python tools/plot_curve.py results/qrdqn_long_run/curve.jsonl out.png
"""

import json
import sys

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt

INK = '#333333'
MUTED = '#8a8a8a'
GRID = '#e6e6e6'
SERIES = '#2a78d6'  # categorical slot 1 (blue)


def main():
  curve_path = sys.argv[1] if len(sys.argv) > 1 else \
      'results/qrdqn_long_run/curve.jsonl'
  out_path = sys.argv[2] if len(sys.argv) > 2 else \
      'results/learning_curve_r3.png'

  baseline = None
  steps, twr = [], []
  with open(curve_path) as f:
    for line in f:
      rec = json.loads(line)
      if 'baseline' in rec:
        baseline = rec['baseline']['station_seeker_mean_twr']
      elif 'eval_mean_twr' in rec:
        steps.append(rec['env_steps'] / 1e6)
        twr.append(rec['eval_mean_twr'])

  fig, ax = plt.subplots(figsize=(8, 4.2), dpi=110)
  ax.set_facecolor('white')
  ax.grid(axis='y', color=GRID, linewidth=0.8)
  for spine in ('top', 'right'):
    ax.spines[spine].set_visible(False)
  for spine in ('left', 'bottom'):
    ax.spines[spine].set_color(MUTED)

  if baseline is not None:
    ax.axhline(baseline, color=MUTED, linewidth=1.4, linestyle=(0, (4, 3)))
    ax.annotate(f'StationSeeker  {baseline:.2f}',
                xy=(0.99, baseline), xycoords=('axes fraction', 'data'),
                xytext=(0, 5), textcoords='offset points',
                ha='right', color=MUTED, fontsize=9)

  ax.plot(steps, twr, color=SERIES, linewidth=2.0)
  if steps:
    ax.plot(steps[-1], twr[-1], 'o', color=SERIES, markersize=5)
    ax.annotate(f'{twr[-1]:.2f}', xy=(steps[-1], twr[-1]),
                xytext=(2, -14), textcoords='offset points',
                color=INK, fontsize=9)

  ax.set_xlabel('environment steps (millions)', color=INK)
  ax.set_ylabel('eval TWR (100 seeds)', color=INK)
  ax.set_title('QR-DQN from scratch — eval time-within-radius during '
               'training', color=INK, fontsize=11, loc='left')
  ax.set_ylim(0.0, max(1.0, max(twr, default=1.0) + 0.05))
  ax.tick_params(colors=MUTED)
  fig.tight_layout()
  fig.savefig(out_path)
  print('wrote', out_path)


if __name__ == '__main__':
  main()
