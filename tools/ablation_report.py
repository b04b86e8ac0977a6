"""Summarize the round-5 plateau ablation arms against the base curve.

Reads results/flagship_r5_base/curve.jsonl and every
results/ablation_r5_*/curve.jsonl, aligns arms on post-branch iteration
(all arms resume from the common iteration-48 light checkpoint), and
emits a compact JSON + markdown table of eval TWR trajectories.

Usage: python tools/ablation_report.py [--out results/ablation_r5_report.json]
"""

import argparse
import glob
import json
import os


def evals(path):
  rows = [json.loads(l) for l in open(path)]
  return [(r['iteration'], r['eval_mean_twr']) for r in rows
          if r.get('eval_mean_twr') is not None and 'iteration' in r]


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--base', default='results/flagship_r5_base/curve.jsonl')
  p.add_argument('--branch_iteration', type=int, default=48)
  p.add_argument('--out', default='results/ablation_r5_report.json')
  args = p.parse_args()

  report = {'branch_iteration': args.branch_iteration, 'arms': {}}
  if os.path.exists(args.base):
    base = evals(args.base)
    report['base'] = {'evals': base,
                      'at_branch': dict(base).get(args.branch_iteration)}

  for curve in sorted(glob.glob('results/ablation_r5_*/curve.jsonl')):
    arm = curve.split('ablation_r5_')[1].split('/')[0]
    ev = [e for e in evals(curve) if e[0] > args.branch_iteration]
    if not ev:
      continue
    twrs = [t for _, t in ev]
    report['arms'][arm] = {
        'post_branch_evals': ev,
        'best': max(twrs),
        'final': twrs[-1],
        'mean': sum(twrs) / len(twrs),
    }

  with open(args.out, 'w') as f:
    json.dump(report, f, indent=2)

  print(f"base at branch (it {args.branch_iteration}): "
        f"{report.get('base', {}).get('at_branch')}")
  print('| arm | post-branch evals (iteration: TWR) | best | final |')
  print('|---|---|---|---|')
  for arm, r in sorted(report['arms'].items()):
    pts = ' '.join(f"{i}:{t:.4f}" for i, t in r['post_branch_evals'])
    print(f"| {arm} | {pts} | {r['best']:.4f} | {r['final']:.4f} |")
  print('wrote', args.out)


if __name__ == '__main__':
  main()
