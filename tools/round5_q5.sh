#!/usr/bin/env bash
# Round-5 chip queue #5 — (a) the labeling micro-bench that pinpoints the
# 2D-256² device-refine blow-up (refine_bench reversal), (b) a guarded
# resume of the full-length training run in case its q3 stage hit the
# 6000 s timeout (the trainer resumes from the last periodic ckpt; exits
# immediately if already finished), followed by the dependent eval stages
# when they had nothing to evaluate the first time.
#
#   nohup bash tools/round5_q5.sh > /tmp/round5_q5.log 2>&1 &
#   echo $! > /tmp/round5_q5.pid
source "$(dirname "$0")/queue_lib.sh"
queue_init round5_q5

wait_for_pid /tmp/round5_q4.pid round5_q4 21600

stage bench_labeling_256 1800 python tools/bench_labeling.py --sb 16 --hw 256
stage bench_labeling_128 1200 python tools/bench_labeling.py --sb 16 --hw 128

if ! grep -q "Training finished" /tmp/round5_q3/full_train.log 2>/dev/null; then
  stage full_train_resume 6000 python tools/run_full_train.py train
  stage full_report2 300 python tools/run_full_train.py report
  stage full_final_eval2 2400 python tools/run_full_train.py final_eval
  stage full_evalall2 3600 python tools/run_full_train.py evalall
fi

echo "=== [$(date +%H:%M:%S)] round-5 queue 5 complete"
