#!/usr/bin/env bash
# Round-5 chip queue #4 — flagship GUNet with the HBM volume cache (the
# round-5 profile showed the flagship was host-input-bound: 85.5 ms device
# self time vs 240 ms wall at bs 32).  Batch curve + cached profile.
#
#   nohup bash tools/round5_q4.sh > /tmp/round5_q4.log 2>&1 &
#   echo $! > /tmp/round5_q4.pid
source "$(dirname "$0")/queue_lib.sh"
queue_init round5_q4

wait_for_pid /tmp/round5_q3.pid round5_q3 14400

stage bench_gunet_c32 2400 python tools/bench_train_gunet.py --batch 32
stage bench_gunet_c64 2400 python tools/bench_train_gunet.py --batch 64
stage bench_gunet_c128 2400 python tools/bench_train_gunet.py --batch 128
stage profile_gunet_c 2400 python tools/profile_step.py --config gunet \
  --batch_size 32 --outdir /tmp/boxseg_profile_gunetc_r5
stage bench_final 2400 python bench.py

echo "=== [$(date +%H:%M:%S)] round-5 queue 4 complete"
