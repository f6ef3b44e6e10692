#!/usr/bin/env bash
# Round-4 chip queue, part 6: seed-2 replication of the headline ordering
# (gunet_both > gunet_sp) on the band-v3 benchmark.
#
#   nohup bash tools/round4_queue_seeds.sh > /tmp/chip_queue_seeds.log 2>&1 &
#   echo $! > /tmp/chip_queue_seeds.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/chip_q3
Q=/tmp/chip_q3

stage() {
  local name="$1" to="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name (timeout ${to}s): $*"
  timeout "$to" "$@" > "$Q/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] stage $name rc=$rc"
  tail -2 "$Q/$name.log" | sed 's/^/    /'
  echo "$rc" > "$Q/$name.rc"
}

for rung in gunet_sp gunet_both; do
  stage "seed2_train_$rung" 4200 python tools/ladder_seed_check.py train "$rung" 2 \
    || stage "seed2_train_${rung}_retry" 4200 python tools/ladder_seed_check.py train "$rung" 2
  stage "seed2_eval_$rung" 3600 python tools/ladder_seed_check.py eval "$rung" 2
done

echo "=== [$(date +%H:%M:%S)] seed-2 replication complete"
