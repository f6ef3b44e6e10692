#!/usr/bin/env bash
# Round-5 chip queue #7 — re-acquisition queue.  The driver recycled /tmp
# mid-round, killing queues 3(tail)/4/5/6 and their un-committed evidence:
# the cached-GUNet batch curve (TBD_Q4), the full-length product training
# outcome (TBD_Q3), the labeling micro-bench (TBD_Q5), and queue 6's seed-3
# replication + closing bench.  The ladder scratch and the XLA compile
# cache now live under .scratch/ (durable), so this queue re-runs the lost
# stages once and they stay lost-proof.
#
# Order = value density: cached flagship numbers first, then the long
# resumable full-length train, then the seed-3 replication, closing bench
# last (the driver runs bench.py again at round end; the early bench_warm
# stage pre-warms the headline compile so that run is fast).
#
#   nohup bash tools/round5_q7.sh > /tmp/round5_q7.log 2>&1 &
#   echo $! > /tmp/round5_q7.pid
source "$(dirname "$0")/queue_lib.sh"
queue_init round5_q7

stage ladder_prep 1200 python tools/run_ladder.py prepare

stage bench_warm 2400 python bench.py

stage bench_gunet_c32 3000 python tools/bench_train_gunet.py --batch 32
stage bench_gunet_c64 3000 python tools/bench_train_gunet.py --batch 64
stage bench_gunet_c128 3000 python tools/bench_train_gunet.py --batch 128

stage bench_labeling_256 1800 python tools/bench_labeling.py --sb 16 --hw 256
stage bench_labeling_128 1200 python tools/bench_labeling.py --sb 16 --hw 128

stage profile_gunet_c 2400 python tools/profile_step.py --config gunet \
  --batch_size 32 --outdir /tmp/boxseg_profile_gunetc_r5

stage full_train 7200 python tools/run_full_train.py train
if ! grep -q "Training finished" /tmp/round5_q7/full_train.log 2>/dev/null; then
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

echo "=== [$(date +%H:%M:%S)] round-5 queue 7 complete"
