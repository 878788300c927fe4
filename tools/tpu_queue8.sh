#!/bin/bash
# Round-3 TPU backlog, phase 8 (2026-08-19 ~03:45 UTC).
#
# Supersedes tpu_queue7 stage 2+: the w64 CONVENTIONAL north-star queued
# there is infeasible on this host — tools/estimate_conv_quartets.py puts
# the host-materialized quartet index streams at 0.8 GB (w8) -> 16.7 GB
# (w16), ~20x per water doubling => multi-TB at w64.  The conventional
# builder's static host-gather design caps out around w16-w24 on a 125 GB
# host; the same-system w7.6 comparison must ride the DF path (stream mode)
# or a redesigned on-device quartet enumerator.  Stages here:
#   1. wait out the in-flight cold w16 bench, then re-run it WARM
#      (the driver's end-of-round bench metric + our own warm artifact),
#   2. relay h2d/d2h bandwidth probe (decides whether host-streamed-B DF
#      at w64 is hours or days),
#   3. S22 DF sweep smallest-first for the rest of the night.
# Artifacts commit as they land (lesson: 2026-08-18 VM recycle).
set -u
cd /root/repo
LOG=/root/repo/tpu_queue8.log
DEADLINE=$(date -ud "2026-08-19 14:00" +%s)
echo "=== tpu_queue8 start $(date)" >> "$LOG"

now() { date +%s; }
left() { echo $(( DEADLINE - $(now) )); }

chip_busy() {
  local p pid cmd
  for p in /proc/[0-9]*; do
    pid=${p#/proc/}
    [ "$pid" = "$$" ] && continue
    cmd=$(tr '\0' ' ' < "$p/cmdline" 2>/dev/null)
    case "$cmd" in *python*) ;; *) continue ;; esac
    case "$cmd" in *tpu_init*) continue ;; esac
    if grep -qz "PALLAS_AXON_POOL_IPS=" "$p/environ" 2>/dev/null; then
      return 0
    fi
  done
  return 1
}

commit_artifacts() {
  git add S22_RESULTS.json RESULTS.md MP2_RESULTS.json RELAY_BANDWIDTH.json \
          BENCH_W16_COLD.json BENCH_W16_WARM.json BENCH_DETAILS.json \
          tpu_queue8.log 2>/dev/null
  if ! git diff --cached --quiet 2>/dev/null; then
    git commit -q -m "TPU queue artifacts (auto-commit as they land)" \
      || true
  fi
}

(
  while sleep 600; do
    kill -0 "$$" 2>/dev/null || exit 0
    commit_artifacts
  done
) &
COMMITTER=$!

# 1. wait for the in-flight cold w16 bench, keep its artifact, re-run warm
while chip_busy; do sleep 20; done
cp BENCH_DETAILS.json BENCH_W16_COLD.json 2>/dev/null || true
echo "--- bench w16 warm $(date)" >> "$LOG"
timeout 2400 python -u bench.py >> "$LOG" 2>&1
cp BENCH_DETAILS.json BENCH_W16_WARM.json 2>/dev/null || true
commit_artifacts

# 2. relay bandwidth probe
if [ "$(left)" -gt 600 ]; then
  while chip_busy; do sleep 20; done
  echo "--- relay bandwidth probe $(date)" >> "$LOG"
  timeout 900 python -u tools/probe_relay_bandwidth.py >> "$LOG" 2>&1
  commit_artifacts
fi

# 3. S22 DF sweep, smallest-first, for the rest of the night
if [ "$(left)" -gt 1200 ]; then
  while chip_busy; do sleep 20; done
  echo "--- s22 df resume $(date)" >> "$LOG"
  timeout $(( $(left) - 300 )) \
    python -u tools/run_s22_sweep.py --df-only --order=size --timeout=3600 \
    >> "$LOG" 2>&1
  commit_artifacts
fi

commit_artifacts
kill "$COMMITTER" 2>/dev/null
echo "=== tpu_queue8 done $(date)" >> "$LOG"
