#!/usr/bin/env bash
# Round-4 chip queue, part 7: flagship GUNet batch-amortization arms (the
# lever that won on the UNet headline: 32->374.8, 64->378.0, 128->379.6)
# + a device profile of the GUNet step for PERF.md.  Waits for the seed-2
# replication queue (/tmp/chip_queue_seeds.pid) to release the chip.
#
#   nohup bash tools/round4_queue_part7.sh > /tmp/chip_queue_p7.log 2>&1 &
#   echo $! > /tmp/chip_queue_p7.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/chip_q3
Q=/tmp/chip_q3

if [[ -f /tmp/chip_queue_seeds.pid ]]; then
  while kill -0 "$(cat /tmp/chip_queue_seeds.pid)" 2>/dev/null; do sleep 60; done
fi

stage() {
  local name="$1" to="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name (timeout ${to}s): $*"
  timeout "$to" "$@" > "$Q/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] stage $name rc=$rc"
  tail -2 "$Q/$name.log" | sed 's/^/    /'
  echo "$rc" > "$Q/$name.rc"
}

stage bench_gunet_b16 5400 python tools/bench_train_gunet.py --batch 16
stage bench_gunet_b32 5400 python tools/bench_train_gunet.py --batch 32

echo "=== [$(date +%H:%M:%S)] round-4 queue part 7 complete"
