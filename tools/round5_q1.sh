#!/usr/bin/env bash
# Round-5 chip queue #1 — drain the round-4 close-out evidence (VERDICT r4
# items 1 and 5 + the contaminated b16 arm):
#   1. ladder dataset prep at the NEW durable scratch location (the /tmp
#      recycler killed round-4's part-9 attempt mid-generation)
#   2. clean GUNet batch arms: b16 rerun (round-4's 46.9 was contaminated by
#      a concurrent pytest run; b32 measured 130.8 clean) + b64
#   3. seed-2 replication of the flagship gunet_both > gunet_sp ordering
#   4. bf16-moments gate de-fragiling: unet vs unet_bf16m at seeds 2 and 3
#
#   nohup bash tools/round5_q1.sh > /tmp/round5_q1.log 2>&1 &
#   echo $! > /tmp/round5_q1.pid
source "$(dirname "$0")/queue_lib.sh"
queue_init round5_q1

stage prep 900 python tools/run_ladder.py prepare

stage bench_gunet_b16 2400 python tools/bench_train_gunet.py --batch 16
stage bench_gunet_b64 3000 python tools/bench_train_gunet.py --batch 64

for rung in gunet_sp gunet_both; do
  stage "s2_train_$rung" 4200 python tools/ladder_seed_check.py train "$rung" 2
  stage "s2_eval_$rung"  2400 python tools/ladder_seed_check.py eval  "$rung" 2
done

for seed in 2 3; do
  for rung in unet unet_bf16m; do
    stage "s${seed}_train_$rung" 2400 python tools/ladder_seed_check.py train "$rung" "$seed"
    stage "s${seed}_eval_$rung"  1800 python tools/ladder_seed_check.py eval  "$rung" "$seed"
  done
done

echo "=== [$(date +%H:%M:%S)] round-5 queue 1 complete"
