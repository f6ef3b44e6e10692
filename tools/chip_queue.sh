#!/usr/bin/env bash
# Round-4 chip work queue — run the moment the TPU tunnel returns.
#
# Launch DETACHED (the driver's foreground process cap is 600 s; a detached
# orchestrator sidesteps it and each training rung runs in ONE process so the
# tunnel never pays a resume recompile):
#
#   cd /root/repo
#   nohup bash tools/chip_queue.sh > /tmp/chip_queue.log 2>&1 &
#   echo $! > /tmp/chip_queue.pid
#
# Progress: tail /tmp/chip_queue.log; per-stage logs under /tmp/chip_q/.
# Stages run SEQUENTIALLY (never two TPU jobs at once on the single chip).
# Every stage is bounded by `timeout` so a wedged tunnel cannot hang the
# queue forever; a stage failure is logged and the queue continues (later
# stages are independent).
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
}

# 1. Headline bench (expect >=373; reshape-pool should add a few)
stage bench1 2400 python bench.py

# 2. Re-profile the packed step (pool fix delta + provenance for the
#    remaining HBM-bound fusions via the new compiled_hlo.txt dump)
stage profile 2400 python tools/profile_step.py --outdir /tmp/boxseg_profile_r4
stage parse 600 python tools/parse_profile.py /tmp/boxseg_profile_r4

# 3. bf16 Adam moments A/B on the headline bench
stage bench_bf16m 2400 env BENCH_MOMENT_DTYPE=bfloat16 python bench.py

# 4. Capability ladder at 256^2 (canonical res) — all six rungs.
#    Compile is the dominant cost (GUNet both took 22 min once); each rung
#    trains 2000 steps in one process then evals.
stage ladder_prep 600 python tools/run_ladder.py prepare
for rung in unet gunet_ctx gunet_sp gunet_both inter iin; do
  stage "ladder_train_$rung" 4200 python tools/run_ladder.py train "$rung"
  stage "ladder_eval_$rung" 3600 python tools/run_ladder.py eval "$rung"
done
stage ladder_report 300 python tools/run_ladder.py report

# 5. 3D training throughput (VERDICT #4): packed3d A/B
stage bench3d 3600 python tools/bench_train3d.py

# 6. Flagship GUNet(ctx+sp) 256^2 training row (VERDICT #5)
stage bench_gunet 3600 python tools/bench_train_gunet.py

echo "=== [$(date +%H:%M:%S)] chip queue complete"
