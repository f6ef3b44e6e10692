#!/usr/bin/env bash
# Round-5 chip queue #3 — the remaining round-4 verdict items that need chip
# time:
#   #3  full-length product training run: plateau LR + eval-per-epoch +
#       best/interval-best ckpt + early stop, 20k-step budget, flagship
#       gunet_both config on the hard band-v3 benchmark; then the
#       checkpoint-sweep eval + final best-ckpt guided eval.
#   #4  RVD over-segmentation diagnosis: save seed-2 sp/both predictions,
#       decompose volume error into halo / FP-object / miss terms.
#   #5 (weak) interactive-refinement PERF rows at the canonical 256²:
#       retrain the inter rung (canonical model dir was on recycled /tmp),
#       then device-vs-host refine bench.
#
#   nohup bash tools/round5_q3.sh > /tmp/round5_q3.log 2>&1 &
#   echo $! > /tmp/round5_q3.pid
source "$(dirname "$0")/queue_lib.sh"
queue_init round5_q3

# wait for queue 2 (single chip, one job at a time)
wait_for_pid /tmp/round5_q2.pid round5_q2 7200

stage rvd_save_both2 1800 python tools/rvd_diagnosis.py save gunet_both 2
stage rvd_save_sp2   1800 python tools/rvd_diagnosis.py save gunet_sp 2
stage rvd_analyze_both2 600 python tools/rvd_diagnosis.py analyze gunet_both 2
stage rvd_analyze_sp2   600 python tools/rvd_diagnosis.py analyze gunet_sp 2

stage inter_train 2400 python tools/run_ladder.py train inter
stage refine_bench 2400 python tools/refine_bench.py

stage full_train 6000 python tools/run_full_train.py train
stage full_report 300 python tools/run_full_train.py report
stage full_final_eval 2400 python tools/run_full_train.py final_eval
stage full_evalall 3600 python tools/run_full_train.py evalall

echo "=== [$(date +%H:%M:%S)] round-5 queue 3 complete"
