#!/bin/bash
# Round-4 TPU backlog, phase 12 (2026-08-20 ~04:20 UTC) — supersedes queue11,
# which never launched (the 19:27 VM recycle ended that session first).
#
# State: w16 bench PASSED (0.94 s/iter f64 steady, BENCH_W16_R04.json);
# S22 DF 14/14 attempted PASS (missing: 6,7,13,14,15,20,21,22 — the largest
# systems); conv 11/22 (missing 5,6,7,11,12,13,14,15,20,21,22); w64 direct
# remains arithmetic-infeasible over the 0.016 GB/s d2h relay (ROADMAP.md).
#
# This session has ~2h of chip. Priorities (VERDICT r3):
#   1) first-ever completed w32 bench on device (resumable via df_b_cache),
#   2) S22 DF toward 22/22, biggest-first,
#   3) S22 conv remainder, smallest-first.
set -u
cd /root/repo
LOG=/root/repo/runs/tpu_queue12.log
DEADLINE=$(date -ud "2026-08-20 06:05" +%s)
echo "=== tpu_queue12 start $(date)" >> "$LOG"

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

wait_chip() { while chip_busy; do sleep 30; done; }

commit_artifacts() {
  git add S22_RESULTS.json RESULTS.md MP2_RESULTS.json BENCH_DETAILS.json \
          BENCH_W32_DF.json BENCH_W16_R04.json ARPAE_RESULTS.json \
          runs/*.log runs/*.json 2>/dev/null
  if ! git diff --cached --quiet 2>/dev/null; then
    git commit -q -m "TPU queue artifacts (auto-commit as they land)" || true
  fi
}

(
  while sleep 600; do
    kill -0 "$$" 2>/dev/null || exit 0
    commit_artifacts
  done
) &
COMMITTER=$!

# 1. w32 bench — the "first completed >=w32 on device" deliverable.
#    Resumable past the B build via df_b_cache (bench.py sets runs/w32_B).
#    Tight stall watchdog: the window is short.
if [ "$(left)" -gt 3000 ]; then
  wait_chip
  echo "--- w32 DF bench $(date)" >> "$LOG"
  W32_BUDGET=$(( $(left) - 1500 ))
  [ "$W32_BUDGET" -gt 4800 ] && W32_BUDGET=4800
  STALL_S=1500 timeout "$W32_BUDGET" bash tools/run_bench_nw.sh 32 W32_DF >> "$LOG" 2>&1
  commit_artifacts
fi

# 2. S22 DF sweep, biggest-first (skips recorded passes; the 8 untouched
#    systems are the largest).
if [ "$(left)" -gt 1500 ]; then
  wait_chip
  echo "--- s22 df sweep (rsize) $(date)" >> "$LOG"
  timeout $(( $(left) - 900 )) \
    python -u tools/run_s22_sweep.py --df-only --order=rsize --timeout=2400 \
    >> "$LOG" 2>&1
  commit_artifacts
fi

# 3. S22 conventional remainder, smallest-first (banks S05/S11/S12 first).
if [ "$(left)" -gt 600 ]; then
  wait_chip
  echo "--- s22 conv sweep (size) $(date)" >> "$LOG"
  timeout $(( $(left) - 120 )) \
    python -u tools/run_s22_sweep.py --conv-only --order=size --timeout=1800 \
    >> "$LOG" 2>&1
  commit_artifacts
fi

commit_artifacts
kill "$COMMITTER" 2>/dev/null
echo "=== tpu_queue12 done $(date)" >> "$LOG"
