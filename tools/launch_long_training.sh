#!/bin/bash
# Long QR-DQN training run (VERDICT round-1 item 2): aim >=500M env steps
# with periodic 100-seed evals. Run ON THE TPU (tunnel must be up:
# `timeout 60 python -c "import jax; print(jax.devices())"`).
#
#   nohup bash tools/launch_long_training.sh > /tmp/long_train.log 2>&1 &
#
# Rough budget: round-1 measured 62M env steps / 75 min at 4096 envs;
# 500M is ~10 h. The run checkpoints per iteration and resumes from the
# latest on restart, so it is safe to kill/relaunch as the tunnel allows.
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-results/qrdqn_long_run}
mkdir -p "$OUT"

exec python -u examples/train_learning_curve.py \
  --out "$OUT" \
  --agent quantile \
  --num_envs 4096 \
  --iterations 4000 \
  --episode_length 960 \
  --chunk_steps 96 \
  --samples_per_insert 8.0 \
  --learning_rate 2e-6 \
  --prioritized \
  --eval_seeds 100 \
  --eval_every 8 \
  --max_hours "${MAX_HOURS:-9.5}" \
  --wind_field generative \
  --set "qrdqn.lr_warmup_steps=20000" \
  --set "qrdqn.lr_decay_steps=4000000" \
  --set "qrdqn.lr_final_scale=0.1"
