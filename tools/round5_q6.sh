#!/usr/bin/env bash
# Round-5 chip queue #6 — third seed for the flagship both>sp ordering
# (seed 1 ledger +0.019, seed 2 +0.055; a third independent draw makes the
# signature quality claim 3-for-3), then a final closing bench.
#
#   nohup bash tools/round5_q6.sh > /tmp/round5_q6.log 2>&1 &
#   echo $! > /tmp/round5_q6.pid
source "$(dirname "$0")/queue_lib.sh"
queue_init round5_q6

wait_for_pid /tmp/round5_q5.pid round5_q5 28800

for rung in gunet_sp gunet_both; do
  stage "s3_train_$rung" 4200 python tools/ladder_seed_check.py train "$rung" 3
  stage "s3_eval_$rung"  2400 python tools/ladder_seed_check.py eval  "$rung" 3
done

stage bench_close 2400 python bench.py

echo "=== [$(date +%H:%M:%S)] round-5 queue 6 complete"
