#!/usr/bin/env bash
# Round-4 chip queue, part 3: headline-bench A/B matrix for the perf levers
# prepared this round.  Waits for part 2 (ladder/3D/GUNet evidence,
# /tmp/chip_queue2.pid) to release the chip, then runs each arm.
#
#   nohup bash tools/round4_queue_perf.sh > /tmp/chip_queue3.log 2>&1 &
#   echo $! > /tmp/chip_queue3.pid
#
# Arms (baseline already measured: 374.8 slices/s, window pool, f32 moments):
#   dts        — depth-to-space upconv backward (kills the 1.42 ms of
#                activation reverses; relayout risk — measure, don't assume)
#   batch64    — amortize the latency-bound tail fusions
#   combo      — dts + batch64
#   combo_bf16 — dts + batch64 + bf16 Adam moments (admissible only if the
#                unet_bf16m ladder rung shows quality parity)
# Then a fresh profile of the best-guess combo for PERF.md.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/chip_q
Q=/tmp/chip_q

if [[ -f /tmp/chip_queue2.pid ]]; then
  while kill -0 "$(cat /tmp/chip_queue2.pid)" 2>/dev/null; do sleep 60; done
fi

stage() {  # stage <name> <timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name (timeout ${to}s): $*"
  timeout "$to" "$@" > "$Q/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] stage $name rc=$rc"
  tail -2 "$Q/$name.log" | sed 's/^/    /'
  echo "$rc" > "$Q/$name.rc"
}

stage bench_dts     2700 env BOXSEG_UPCONV_IMPL=dts python bench.py
stage bench_gloss   2700 env BOXSEG_LOSS_IMPL=gather python bench.py
stage bench_b64     2700 env BENCH_BATCH_SIZE=64 python bench.py
stage bench_spd8    2700 env BENCH_STEPS_PER_DISPATCH=8 python bench.py
stage bench_combo   2700 env BOXSEG_UPCONV_IMPL=dts BOXSEG_LOSS_IMPL=gather BENCH_BATCH_SIZE=64 BENCH_MOMENT_DTYPE=bfloat16 BENCH_STEPS_PER_DISPATCH=8 python bench.py

stage profile_combo 2400 env BOXSEG_UPCONV_IMPL=dts BOXSEG_LOSS_IMPL=gather python tools/profile_step.py --outdir /tmp/boxseg_profile_r4combo
stage parse_combo    600 python tools/parse_profile.py /tmp/boxseg_profile_r4combo --top 70

echo "=== [$(date +%H:%M:%S)] round-4 queue part 3 complete"
