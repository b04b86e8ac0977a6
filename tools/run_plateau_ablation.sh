#!/bin/bash
# Plateau ablation (VERDICT r4 next-2): the flagship QR-DQN recipe
# plateaus at eval TWR 0.76-0.79 from ~40M env steps (docs/benchmarks.md,
# results/flagship_curve.json). This script branches ablation arms off a
# common plateau checkpoint (the round-5 base rerun's iteration-48 light
# checkpoint, ~47M env steps, eval ~0.75) and runs them sequentially on
# the one available chip:
#
#   control     unchanged recipe (in-run control; the committed long curve
#               predicts 0.76-0.79 oscillation here)
#   lr_rewarm   peak lr 8e-6 with the cosine re-positioned (decay horizon
#               120M grad steps), i.e. ~4x the lr the base schedule has
#               decayed to at the branch point
#   explore_off MarcoPolo exploration off: pure greedy data collection,
#               the closest available analogue of the reference's
#               finetune_perciatelli regime (its path to the 0.8 line)
#   nstep3      replay n-step 5 -> 3 (lower-bias targets near convergence)
#
# Usage: BASE=results/flagship_r5_base ARMS="control lr_rewarm" ITERS=73 \
#          bash tools/run_plateau_ablation.sh
set -eu
cd "$(dirname "$0")/.."

BASE=${BASE:-results/flagship_r5_base}
ARMS=${ARMS:-control lr_rewarm explore_off nstep3}
ITERS=${ITERS:-73}   # branch at 48 -> 24 further iterations

COMMON=(python -u -m examples.train_learning_curve
  --agent quantile --num_envs 1024 --iterations "$ITERS"
  --episode_length 960 --chunk_steps 96 --ckpt_every 8
  --samples_per_insert 8.0 --prioritized --eval_seeds 100 --eval_every 4
  --light_ckpt --wind_field generative)

arm_flags() {
  case "$1" in
    control)
      echo "--learning_rate 2e-6 --set qrdqn.lr_warmup_steps=100000 --set qrdqn.lr_decay_steps=60000000 --set qrdqn.lr_final_scale=0.25" ;;
    lr_rewarm)
      echo "--learning_rate 8e-6 --set qrdqn.lr_warmup_steps=100000 --set qrdqn.lr_decay_steps=120000000 --set qrdqn.lr_final_scale=0.25" ;;
    explore_off)
      echo "--learning_rate 2e-6 --set qrdqn.lr_warmup_steps=100000 --set qrdqn.lr_decay_steps=60000000 --set qrdqn.lr_final_scale=0.25 --set use_marco_polo=False" ;;
    nstep3)
      echo "--learning_rate 2e-6 --set qrdqn.lr_warmup_steps=100000 --set qrdqn.lr_decay_steps=60000000 --set qrdqn.lr_final_scale=0.25 --set replay.n_step=3 --set replay.gamma=0.993" ;;
    *) echo "unknown arm $1" >&2; exit 1 ;;
  esac
}

for arm in $ARMS; do
  out="results/ablation_r5_${arm}"
  if [ ! -d "$out/checkpoints" ]; then
    mkdir -p "$out"
    cp -r "$BASE/checkpoints" "$out/checkpoints"
    cp "$BASE/curve.jsonl" "$out/curve.jsonl"
  fi
  echo "=== arm $arm -> $out ==="
  # shellcheck disable=SC2046
  OUT="$out" STALL_MIN=10 GRACE_MIN=30 MAX_RESTARTS=5 \
    bash tools/run_with_autoresume.sh \
    "${COMMON[@]}" --out "$out" $(arm_flags "$arm")
done
