#!/usr/bin/env bash
# Round-5 chip queue #10 — third re-acquisition.  The driver clean-checkout
# between sessions wiped .scratch/ again, losing queue 9's evidence before
# it was harvested.  Highest-value-first under a ~2h session budget:
#
#   1. ladder_prep        — rebuild the band-v3 dataset sentinel
#   2. full_train + report/final_eval/evalall — the round-4 verdict #3
#      protocol (plateau LR + eval-per-epoch + best/interval ckpts + early
#      stop) that has never yet been demonstrated end to end on-chip
#   3. bench_close        — closing headline bench (also warms the XLA cache
#      for the driver's own BENCH_r05 run)
#   4. seed-3 flagship replication — bonus; seed-1/2 already in the ledger
#
#   nohup bash tools/round5_q10.sh > .scratch/round5_q10.log 2>&1 &
source "$(dirname "$0")/queue_lib.sh"
queue_init round5_q10

stage ladder_prep 1200 python tools/run_ladder.py prepare

stage full_train 6600 python tools/run_full_train.py train
if ! grep -q "Training finished" "$Q/full_train.log" 2>/dev/null; then
  stage full_train_resume 4800 python tools/run_full_train.py train
fi
stage full_report 300 python tools/run_full_train.py report
stage full_final_eval 2400 python tools/run_full_train.py final_eval
stage full_evalall 3600 python tools/run_full_train.py evalall

stage bench_close 2400 python bench.py

for rung in gunet_sp gunet_both; do
  stage "s3_train_$rung" 4200 python tools/ladder_seed_check.py train "$rung" 3
  stage "s3_eval_$rung"  2400 python tools/ladder_seed_check.py eval  "$rung" 3
done

echo "=== [$(date +%H:%M:%S)] round-5 queue 10 complete"
