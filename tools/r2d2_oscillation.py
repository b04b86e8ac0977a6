"""Quantify the R2D2 eval-TWR oscillation (VERDICT r4 next-6, analysis).

The round-4 R2D2 run (results/r2d2_run_r4/curve.jsonl) climbs 0.156 ->
0.69 in 20M env steps but its eval series oscillates. The eval suite is
FIXED (64 deterministic seeds), so successive evals of the same policy
are noise-free: all iteration-to-iteration variation is true policy
movement. This script separates trend from oscillation and compares the
oscillation amplitude against the feedforward QR-DQN flagship's eval
series in its plateau (results/qrdqn_long_run_r4b/curve.jsonl) as the
like-for-like stability reference.

Usage: python tools/r2d2_oscillation.py [--out results/r2d2_oscillation.json]
"""

import argparse
import json

import numpy as np


def eval_series(path):
  rows = [json.loads(l) for l in open(path)]
  return np.array([(r['env_steps'], r['eval_mean_twr'])
                   for r in rows if r.get('eval_mean_twr') is not None])


def detrended_amplitude(series, tail_steps):
  """(slope_per_10M, rms residual, peak-to-peak residual) over the tail."""
  tail = series[series[:, 0] >= series[-1, 0] - tail_steps]
  x, y = tail[:, 0] / 1e7, tail[:, 1]
  slope, icpt = np.polyfit(x, y, 1)
  resid = y - (slope * x + icpt)
  return float(slope), float(np.sqrt((resid ** 2).mean())), float(
      resid.max() - resid.min()), len(tail)


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--r2d2', default='results/r2d2_run_r4/curve.jsonl')
  p.add_argument('--flagship', default='results/qrdqn_long_run_r4b/curve.jsonl')
  p.add_argument('--out', default='results/r2d2_oscillation.json')
  args = p.parse_args()

  r2 = eval_series(args.r2d2)
  fl = eval_series(args.flagship)

  r2_slope, r2_rms, r2_p2p, r2_n = detrended_amplitude(r2, 10_000_000)
  fl_slope, fl_rms, fl_p2p, fl_n = detrended_amplitude(fl, 30_000_000)

  dips = [(int(s), float(t)) for s, t in r2
          if t < 0.5 and s > 5_000_000]

  report = {
      'r2d2': {
          'curve': args.r2d2,
          'final_eval_twr': float(r2[-1, 1]),
          'best_eval_twr': float(r2[:, 1].max()),
          'station_seeker_line': 0.6981,
          'tail_10M': {'slope_per_10M': r2_slope, 'rms_residual': r2_rms,
                       'peak_to_peak_residual': r2_p2p, 'num_evals': r2_n},
          'deep_dips_after_5M': dips,
      },
      'flagship_qrdqn_reference': {
          'curve': args.flagship,
          'tail_30M': {'slope_per_10M': fl_slope, 'rms_residual': fl_rms,
                       'peak_to_peak_residual': fl_p2p, 'num_evals': fl_n},
      },
      'notes': (
          'Fixed 64-seed eval suite: series variation is policy movement, '
          'not eval noise. R2D2 rms residual vs the feedforward flagship '
          'plateau quantifies the recurrent recipe\'s instability; the '
          'flagship runs lr 2e-6 on a cosine, the R2D2 recipe lr 5e-5 '
          'constant (25x) chosen for the round-4 20M-step demonstration.'),
  }
  with open(args.out, 'w') as f:
    json.dump(report, f, indent=2)
  print(json.dumps(report['r2d2']['tail_10M'], indent=2))
  print(json.dumps(report['flagship_qrdqn_reference']['tail_30M'], indent=2))
  print('deep dips:', dips)
  print('wrote', args.out)


if __name__ == '__main__':
  main()
