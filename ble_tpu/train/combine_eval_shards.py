"""Merges sharded eval JSON outputs (reference eval/combine_eval_shards.py).

  python -m ble_tpu.train.combine_eval_shards out.json shard0.json shard1.json
"""

import json
import sys

from ble_tpu.train import eval_lib


def main():
  if len(sys.argv) < 3:
    print(__doc__)
    sys.exit(1)
  out_path, shard_paths = sys.argv[1], sys.argv[2:]
  combined = eval_lib.combine_shard_results(shard_paths)
  with open(out_path, 'w') as f:
    json.dump({'results': combined}, f)
  print(f'Wrote {len(combined)} results to {out_path}')


if __name__ == '__main__':
  main()
