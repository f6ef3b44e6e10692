#!/usr/bin/env bash
# Round-5 chip queue #11 — seed-3 flagship ordering replication, resumed.
# Queue 10 landed everything else (full-train protocol, closing bench) but
# the session VM restarted ~2 min into s3_train_gunet_sp.  The band-v3
# dataset sentinel survived under .scratch/, so only the seed-3 stages
# re-run here.
#
#   nohup bash tools/round5_q11.sh > .scratch/round5_q11.log 2>&1 &
source "$(dirname "$0")/queue_lib.sh"
queue_init round5_q11

stage ladder_prep 1200 python tools/run_ladder.py prepare

for rung in gunet_sp gunet_both; do
  stage "s3_train_$rung" 4200 python tools/ladder_seed_check.py train "$rung" 3
  stage "s3_eval_$rung"  2400 python tools/ladder_seed_check.py eval  "$rung" 3
done

echo "=== [$(date +%H:%M:%S)] round-5 queue 11 complete"
