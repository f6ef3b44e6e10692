# Shared chip-queue machinery.  Source from a thin per-round script:
#
#   source "$(dirname "$0")/queue_lib.sh"
#   queue_init round5_q1                # -> $Q=/tmp/<name>, distinct per queue
#   stage prep 600 python tools/run_ladder.py prepare
#   ...
#
# Replaces the eight near-identical round4_queue_*.sh scripts (ADVICE r4:
# consolidate; fix the stale-pid wait and the shared-output-dir clobbering).
#
# Launch pattern (the Bash tool's foreground cap is 600 s; a detached
# orchestrator sidesteps it and each stage runs in ONE process so the TPU
# tunnel never pays a resume recompile):
#
#   nohup bash tools/<script>.sh > /tmp/<name>.log 2>&1 &
#   echo $! > /tmp/<name>.pid
#
# Rules encoded here:
#  - stages run SEQUENTIALLY, never two TPU jobs at once on the single chip
#  - every stage is bounded by `timeout`; failure is logged and the queue
#    continues (later stages are independent)
#  - per-stage logs + rc files land in a queue-SPECIFIC dir (never shared
#    between queues, so no evidence trail is ever clobbered)
#  - wait_for_pid validates the pid's cmdline before waiting (stale pidfiles
#    on this host are a real hazard: pids recycle, kill -0 is unreliable in
#    the sandbox) and always applies a hard deadline

set -u

queue_init() {  # queue_init <name>
  QNAME="$1"
  # Default queue-log root moved off /tmp (round 5: the driver's /tmp
  # recycler destroyed four queues' evidence mid-round); .scratch/ is
  # repo-local + gitignored and survives the recycler.
  Q="${BOXSEG_QDIR:-$(dirname "${BASH_SOURCE[1]}")/../.scratch/queues}/$QNAME"
  mkdir -p "$Q"
  Q="$(cd "$Q" && pwd)"
  cd "$(dirname "${BASH_SOURCE[1]}")/.."
  echo "=== [$(date +%H:%M:%S)] queue $QNAME start (logs: $Q)"
}

stage() {  # stage <name> <timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name (timeout ${to}s): $*"
  timeout "$to" "$@" > "$Q/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] stage $name rc=$rc"
  tail -3 "$Q/$name.log" | sed 's/^/    /'
  echo "$rc" > "$Q/$name.rc"
}

wait_for_pid() {  # wait_for_pid <pidfile> <cmdline_substring> <max_wait_s>
  local pidfile="$1" pat="$2" deadline="$3" waited=0
  [[ -f "$pidfile" ]] || return 0
  local pid; pid="$(cat "$pidfile")"
  # only wait if the pid is alive AND its cmdline matches what the pidfile
  # claims it is (a recycled pid of an unrelated long-lived process must not
  # block the queue forever)
  while [[ -d "/proc/$pid" ]] \
      && tr '\0' ' ' < "/proc/$pid/cmdline" 2>/dev/null | grep -q "$pat"; do
    if (( waited >= deadline )); then
      echo "=== wait_for_pid: deadline ${deadline}s exceeded for pid $pid ($pat); proceeding"
      return 1
    fi
    sleep 20; waited=$((waited + 20))
  done
  return 0
}
