#!/usr/bin/env bash
# Round-4 chip queue, part 8 (final session): the two pieces of queued work
# that never reached the chip before /tmp was recycled —
#   1. flagship GUNet batch-amortization arms (bs 16 / 32; bs 8 = 80.3)
#   2. seed-2 replication of the ladder's both>sp ordering claim
# plus a closing headline bench confirmation at the shipped default.
#
#   nohup bash tools/round4_queue_part8.sh > /tmp/chip_queue_p8.log 2>&1 &
#   echo $! > /tmp/chip_queue_p8.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/chip_q8
Q=/tmp/chip_q8

stage() {
  local name="$1" to="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name (timeout ${to}s): $*"
  timeout "$to" "$@" > "$Q/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] stage $name rc=$rc"
  tail -2 "$Q/$name.log" | sed 's/^/    /'
  echo "$rc" > "$Q/$name.rc"
}

stage bench_gunet_b16 4200 python tools/bench_train_gunet.py --batch 16
stage bench_gunet_b32 4200 python tools/bench_train_gunet.py --batch 32

stage seed2_train_sp   4200 python tools/ladder_seed_check.py train gunet_sp 2
stage seed2_eval_sp    2400 python tools/ladder_seed_check.py eval  gunet_sp 2
stage seed2_train_both 4200 python tools/ladder_seed_check.py train gunet_both 2
stage seed2_eval_both  2400 python tools/ladder_seed_check.py eval  gunet_both 2

stage bench_final 2400 python bench.py

echo "=== [$(date +%H:%M:%S)] round-4 queue part 8 complete"
