#!/usr/bin/env bash
# Round-4 chip queue, part 5: post-ladder bench arms. Waits for the v3
# ladder queue (/tmp/chip_queue_v3.pid) to release the chip, then:
#   bench_b128     — does the batch-amortization win extend 64 -> 128?
#   bench_bf16m64  — bf16 Adam moments at the new batch-64 default (the
#                    product-default flip is committed separately iff the
#                    unet_bf16m ladder rung shows quality parity)
#
#   nohup bash tools/round4_queue_part5.sh > /tmp/chip_queue_p5.log 2>&1 &
#   echo $! > /tmp/chip_queue_p5.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/chip_q3
Q=/tmp/chip_q3

if [[ -f /tmp/chip_queue_v3.pid ]]; then
  while kill -0 "$(cat /tmp/chip_queue_v3.pid)" 2>/dev/null; do sleep 60; done
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

stage bench_b128    2700 env BENCH_BATCH_SIZE=128 python bench.py
stage bench_bf16m64 2700 env BENCH_MOMENT_DTYPE=bfloat16 python bench.py

echo "=== [$(date +%H:%M:%S)] round-4 queue part 5 complete"
