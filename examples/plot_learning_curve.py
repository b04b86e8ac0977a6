"""Plots a curve.jsonl from examples/train_learning_curve.py to PNG.

Produces the rebuild's counterpart of the reference's training-curve
figure (docs/benchmarks.rst / docs/imgs/training_curve.jpg): greedy-eval
mean TWR against environment steps, with the StationSeeker baseline as a
horizontal reference line.

  python -m examples.plot_learning_curve --curve /tmp/curve/curve.jsonl \
      --out /tmp/curve/learning_curve.png
"""

import argparse
import json

# Categorical slots 1-2 of the validated palette (dataviz skill):
BLUE = '#2a78d6'
ORANGE = '#eb6834'
INK = '#333333'
MUTED = '#767676'


def load(path):
  baseline = None
  rows = []
  with open(path) as f:
    for line in f:
      rec = json.loads(line)
      if 'baseline' in rec:
        baseline = rec['baseline']
      elif 'eval_mean_twr' in rec:
        rows.append(rec)
  return baseline, rows


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('--curve', required=True)
  p.add_argument('--out', required=True)
  p.add_argument('--title', default='QR-DQN on ble_tpu (one TPU v5e chip)')
  args = p.parse_args()

  baseline, rows = load(args.curve)
  if not rows:
    raise SystemExit('no eval records in ' + args.curve)

  import matplotlib
  matplotlib.use('Agg')
  import matplotlib.pyplot as plt

  steps = [r['env_steps'] / 1e6 for r in rows]
  twr = [r['eval_mean_twr'] for r in rows]

  fig, ax = plt.subplots(figsize=(8, 4.5))
  ax.plot(steps, twr, color=BLUE, lw=2, label='QR-DQN (greedy eval)')
  if baseline is not None:
    ss = baseline['station_seeker_mean_twr']
    ax.axhline(ss, color=ORANGE, lw=2, ls=(0, (6, 3)), label='StationSeeker')
    ax.annotate(f'StationSeeker {ss:.3f}', xy=(steps[-1], ss),
                xytext=(-4, 6), textcoords='offset points', ha='right',
                color=INK, fontsize=9)
  ax.set_xlabel('environment steps (millions)', color=INK)
  n = baseline['num_eval_seeds'] if baseline else '?'
  ax.set_ylabel(f'mean TWR over {n} fixed eval seeds', color=INK)
  ax.set_title(args.title, color=INK)
  ax.set_ylim(0, 1)
  ax.grid(True, color='#e4e4e4', lw=0.75)
  ax.set_axisbelow(True)
  for side in ('top', 'right'):
    ax.spines[side].set_visible(False)
  for side in ('left', 'bottom'):
    ax.spines[side].set_color(MUTED)
  ax.tick_params(colors=MUTED)
  ax.legend(frameon=False, loc='lower right')
  fig.tight_layout()
  fig.savefig(args.out, dpi=130)
  print('wrote', args.out)


if __name__ == '__main__':
  main()
