#!/usr/bin/env bash
# Round-4 chip work queue, part 2 (the bench / pool-A/B / bf16-A/B / profile
# stages of chip_queue.sh already ran — see /tmp/chip_q/*.log and commit
# cf684c2).  Remaining driver-visible evidence, priority order:
#
#   1. capability ladder at 256^2 on the band-v2 hard benchmark, highest-
#      leverage rungs first (iin = VERDICT missing #2; unet/sp/both = the
#      both<=sp ordering question, VERDICT weak #2; inter = resolution
#      unification, weak #4; unet_bf16m = quality gate for the bf16-moments
#      perf default)
#   2. 3D training throughput (VERDICT next #4)
#   3. flagship GUNet(ctx+sp) 256^2 training row (VERDICT next #5)
#
# Launch DETACHED (600 s foreground cap; one process per training rung so
# the tunnel never pays a resume recompile):
#
#   cd /root/repo
#   nohup bash tools/round4_queue.sh > /tmp/chip_queue2.log 2>&1 &
#   echo $! > /tmp/chip_queue2.pid
#
# Stages run SEQUENTIALLY (single chip).  Each bounded by `timeout`; a
# failed train stage gets ONE resume retry (checkpointed), then the queue
# moves on — later stages are independent.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/chip_q
Q=/tmp/chip_q

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

stage ladder_prep 900 python tools/run_ladder.py prepare

for rung in iin unet gunet_sp gunet_both gunet_ctx inter unet_bf16m; do
  stage "ladder_train_$rung" 4200 python tools/run_ladder.py train "$rung" \
    || stage "ladder_train_${rung}_retry" 4200 python tools/run_ladder.py train "$rung"
  stage "ladder_eval_$rung" 3600 python tools/run_ladder.py eval "$rung"
done
stage ladder_report 300 python tools/run_ladder.py report

stage bench3d_on  3600 python tools/bench_train3d.py --lane_pack on
stage bench3d_off 3600 python tools/bench_train3d.py --lane_pack off

stage bench_gunet 5400 python tools/bench_train_gunet.py

echo "=== [$(date +%H:%M:%S)] round-4 queue part 2 complete"
