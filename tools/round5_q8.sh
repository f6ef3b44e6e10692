#!/usr/bin/env bash
# Round-5 chip queue #8 — second re-acquisition.  The driver did a CLEAN
# CHECKOUT between sessions, wiping /tmp AND the gitignored .scratch/, so
# queue 7's tail evidence is lost again: the full-length product training
# outcome (TBD_Q3), the seed-3 flagship replication, and the closing bench.
# This queue re-runs exactly those stages; everything earlier in q7 (cached
# GUNet curve, labeling bench, profiles) was harvested into
# experiments/logs/ + profiles/ before the wipe and does NOT re-run.
#
# Order = value density: the full-length train (round-4 verdict item #3,
# never yet demonstrated) first after a cheap prep + compile warm, then the
# seed-3 replication, closing bench last.
#
#   nohup bash tools/round5_q8.sh > .scratch/round5_q8.log 2>&1 &
#   echo $! > .scratch/round5_q8.pid
source "$(dirname "$0")/queue_lib.sh"
queue_init round5_q8

stage ladder_prep 1200 python tools/run_ladder.py prepare

stage bench_warm 2400 python bench.py

stage full_train 7200 python tools/run_full_train.py train
if ! grep -q "Training finished" "$Q/full_train.log" 2>/dev/null; then
  stage full_train_resume 6000 python tools/run_full_train.py train
fi
stage full_report 300 python tools/run_full_train.py report
stage full_final_eval 2400 python tools/run_full_train.py final_eval
stage full_evalall 3600 python tools/run_full_train.py evalall

for rung in gunet_sp gunet_both; do
  stage "s3_train_$rung" 4200 python tools/ladder_seed_check.py train "$rung" 3
  stage "s3_eval_$rung"  2400 python tools/ladder_seed_check.py eval  "$rung" 3
done

stage bench_close 2400 python bench.py

echo "=== [$(date +%H:%M:%S)] round-5 queue 8 complete"
