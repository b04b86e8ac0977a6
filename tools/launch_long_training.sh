#!/bin/bash
# Long QR-DQN training run. Round-3 proven config: 1024 envs, prioritized
# replay, warmup+cosine LR sized to the run's grad-step horizon (peak
# 2e-6, the reference value). Reached eval TWR 0.740 (above the
# StationSeeker 0.728 line) at 40M env steps in ~70 min; resumes from the
# latest checkpoint in $OUT (results/qrdqn_long_run has iteration 42).
#
#   nohup bash tools/launch_long_training.sh > /tmp/long_train.log 2>&1 &
#
# Sizing notes (learned in round 3):
#  - grad steps/env-step = num_envs * SPI / batch = 1024*8/32 = 256;
#    one iteration = 960 env steps = 245,760 grad steps. Size
#    qrdqn.lr_decay_steps to the full run's grad-step budget or lr
#    collapses early (results/qrdqn_run_badlr: 0.27 plateau).
#  - HBM: the replay obs ring (envs x ring_len x 1099 f32) dominates;
#    2048+ envs needs --donate, which the remote-TPU tunnel rejects
#    (INVALID_ARGUMENT) but directly-attached TPUs accept.
#  - Checkpoint downloads through the tunnel take ~28 min at 1024 envs;
#    keep ckpt_every sparse.
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-results/qrdqn_long_run}
mkdir -p "$OUT"

exec python -u -m examples.train_learning_curve \
  --out "$OUT" \
  --agent quantile \
  --num_envs 1024 \
  --iterations 4000 \
  --episode_length 960 \
  --chunk_steps 96 \
  --ckpt_every 50 \
  --samples_per_insert 8.0 \
  --learning_rate 2e-6 \
  --prioritized \
  --eval_seeds 100 \
  --eval_every 8 \
  --max_hours "${MAX_HOURS:-9.5}" \
  --wind_field generative \
  --set "qrdqn.lr_warmup_steps=100000" \
  --set "qrdqn.lr_decay_steps=60000000" \
  --set "qrdqn.lr_final_scale=0.25"
