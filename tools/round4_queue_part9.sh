#!/usr/bin/env bash
# Round-4 chip queue, part 9: corrected close-out order.  Waits for the
# in-flight GUNet b16 arm (pid in /tmp/gunet_b16.pid) to release the chip,
# then: ladder dataset prep (the /tmp dataset was recycled) -> seed-2
# replication of the both>sp ordering (the highest-value pending claim) ->
# GUNet b32 arm -> closing headline bench.
#
#   nohup bash tools/round4_queue_part9.sh > /tmp/chip_queue_p9.log 2>&1 &
#   echo $! > /tmp/chip_queue_p9.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/chip_q8
Q=/tmp/chip_q8

if [[ -f /tmp/gunet_b16.pid ]]; then
  while kill -0 "$(cat /tmp/gunet_b16.pid)" 2>/dev/null; do sleep 20; done
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

stage ladder_prep 600 python tools/run_ladder.py prepare

stage seed2_train_sp   4200 python tools/ladder_seed_check.py train gunet_sp 2
stage seed2_eval_sp    2400 python tools/ladder_seed_check.py eval  gunet_sp 2
stage seed2_train_both 4200 python tools/ladder_seed_check.py train gunet_both 2
stage seed2_eval_both  2400 python tools/ladder_seed_check.py eval  gunet_both 2

stage bench_gunet_b32 4200 python tools/bench_train_gunet.py --batch 32

stage bench_final 2400 python bench.py

echo "=== [$(date +%H:%M:%S)] round-4 queue part 9 complete"
