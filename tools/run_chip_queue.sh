#!/bin/bash
# Serialized chip job queue for the round-3 close-out. Chip jobs MUST run
# one at a time (concurrent axon clients conflict on libtpu_lockfile), and
# fresh full-step compiles take ~20-25 min through the remote compiler.
#
# Queue:
#   1. gn_micro      — tools/bench_gn_stats.py (MXU vs reduce GN stats)
#   2. ns512_b2      — tools/bench_ns512.py --batches=2 (GELUTanh re-rate,
#                      the number BASELINE.md's ns512 section points at)
#   3. bench_all     — all five families with the shipped GELUTanh
#
# depth1_mxu (full-step NPS_GN_STATS=mxu A/B) was dropped: the gn_micro
# verdict settled mxu as a loser (fwd+bwd 31.1 vs 3.2 ms/pass on chip),
# so the full-step run would burn ~1h of chip for no information.
#
# Logs land in /tmp/chip_queue/<name>.log; a PASS/FAIL summary is appended
# to /tmp/chip_queue/summary.txt after each job.

set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue
mkdir -p "$LOG"
: > "$LOG/summary.txt"

# a local AOT compile (tools/bench_ns512_layouts.py) may hold the libtpu
# lockfile for up to ~2h; wait for it rather than racing every queue job.
# Bounded (3h) and cmdline-checked: kill -0 alone can match a reused pid
# forever if the AOT crashed without cleaning up its pid file.
WAITED=0
while [ -f /tmp/zero1_aot.pid ]; do
  AOT_PID=$(cat /tmp/zero1_aot.pid)
  if ! kill -0 "$AOT_PID" 2>/dev/null; then break; fi
  if ! grep -qa python "/proc/$AOT_PID/cmdline" 2>/dev/null; then
    echo "stale AOT pid $AOT_PID (not python); proceeding" >> "$LOG/summary.txt"
    break
  fi
  if [ "$WAITED" -ge 10800 ]; then
    echo "AOT wait exceeded 3h; proceeding anyway" >> "$LOG/summary.txt"
    break
  fi
  echo "waiting for local AOT ($AOT_PID) $(date +%H:%M:%S)" >> "$LOG/summary.txt"
  sleep 120; WAITED=$((WAITED + 120))
done

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S)" | tee -a "$LOG/summary.txt"
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc end $(date +%H:%M:%S)" | tee -a "$LOG/summary.txt"
  tail -3 "$LOG/$name.log" | sed 's/^/    /' >> "$LOG/summary.txt"
}

run gn_micro   2400 python tools/bench_gn_stats.py
# TP layout memory re-check: the original analysis replicated the Adam
# state (fixed — the real TP trainer shards it); dp4_tp2_b16 may now fit.
# Local AOT compile — needs >1h on a 1-vCPU host (timed out at 3600 once).
run ns512_tp   9000 python tools/bench_ns512_layouts.py dp4_tp2_b16
run ns512_b2   3600 python tools/bench_ns512.py --batches=2
run export_tpu 1800 python tools/check_export_tpu.py
run bench_all  9000 python tools/bench_all.py
run profile1   3600 python tools/profile_step.py /tmp/profile_tanh 1
echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a "$LOG/summary.txt"
