#!/usr/bin/env bash
# Round-4 chip queue, part 4: the band-v3 ladder re-run (the v2 256^2 rows
# were measurement artifacts of the zero-background x unmasked-eval-z-score
# domain shift — see experiments.md round-4 entry and commit 43dd25c) plus
# the 3D packed-vs-unpacked A/B retry at batch 2 (the unpacked arm OOMs HBM
# at batch 4: 2.1x tiling-padding expansion on [B,C,D,17,60] temps).
#
# Launch DETACHED (600 s foreground cap; one process per training rung so
# the tunnel never pays a resume recompile):
#
#   cd /root/repo
#   nohup bash tools/round4_queue_v3.sh > /tmp/chip_queue_v3.log 2>&1 &
#   echo $! > /tmp/chip_queue_v3.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/chip_q3
Q=/tmp/chip_q3

stage() {  # stage <name> <timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name (timeout ${to}s): $*"
  timeout "$to" "$@" > "$Q/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] stage $name rc=$rc"
  tail -3 "$Q/$name.log" | sed 's/^/    /'
  echo "$rc" > "$Q/$name.rc"
  return $rc
}

# v2 model dirs hold step-2000 checkpoints of the discarded run — training
# would resume-and-exit instantly. Fresh start for every rung.
rm -rf /tmp/boxseg_ladder_256/model_dir

stage ladder_prep 1800 python tools/run_ladder.py prepare

# floors first (unet/sp/both/ctx), then inter/iin, then the bf16 quality arm
for rung in unet gunet_sp gunet_both gunet_ctx inter iin unet_bf16m; do
  stage "ladder_train_$rung" 4200 python tools/run_ladder.py train "$rung" \
    || stage "ladder_train_${rung}_retry" 4200 python tools/run_ladder.py train "$rung"
  stage "ladder_eval_$rung" 3600 python tools/run_ladder.py eval "$rung"
done
stage ladder_report 300 python tools/run_ladder.py report

stage bench3d_on_b2  3600 python tools/bench_train3d.py --lane_pack on  --batch 2
stage bench3d_off_b2 3600 python tools/bench_train3d.py --lane_pack off --batch 2

echo "=== [$(date +%H:%M:%S)] round-4 queue v3 complete"
