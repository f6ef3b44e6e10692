#!/usr/bin/env bash
# Round-5 chip queue #9 — queue 8's full_train ran with the pre-fix
# OnlineEval2D whose eager jnp metric calls cost a tunnel round trip per op
# (~3-4 min per epoch-end eval), which would have blown the stage timeout
# before plateau early-stop could fire.  online2d.py now computes all batch
# metrics in ONE jitted call; this queue re-runs the full-length protocol
# clean under the fixed code (model_dir wiped below), then the seed-3
# replication and the closing bench.  ladder_prep/bench_warm already done
# by queue 8 (dataset sentinel + XLA cache live in .scratch/).
#
#   nohup bash tools/round5_q9.sh > .scratch/round5_q9.log 2>&1 &
source "$(dirname "$0")/queue_lib.sh"
queue_init round5_q9

rm -rf .scratch/boxseg_ladder_256/model_dir/gunet_both_full

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

echo "=== [$(date +%H:%M:%S)] round-5 queue 9 complete"
