#!/bin/bash
# Round-5 TPU backlog, phase 13 (2026-08-20 ~21:20 UTC) — fresh 9h session,
# cold VM (no ~/.cache/jchem_xla, no runs/*_B caches).
#
# State at queue start: S22 DF 14/22 (missing 6,7,13,14,15,20,21,22 — the
# largest), conv 11/22 (missing 5,6,7,11,12,13,14,15,20,21,22); no w>=32 run
# has ever completed; families gly1 only, ARPA-E unrecorded.  The round-5
# engineering (3c pipelined build 463a450, sph-projected aux a5855a1,
# budget-aware bench 98d0cf4) is committed but unproven on the chip beyond
# the w4 smoke that precedes this queue.
#
# Priorities (VERDICT r4 "Next round" items 1,2,3,8):
#   1) w16 bench — proves the redesigned build end-to-end, warms the XLA
#      cache and writes runs/w16_B so the driver's end-of-round bench.py
#      picks w16 instead of downshifting (VERDICT #1).
#   2) first-ever completed w32 bench (VERDICT #2).
#   3) S22 DF remainder, biggest-first, then conv remainder with --df-guess
#      (VERDICT #3).
#   4) families: gly2/gly3 + ARPA-E fig1e (VERDICT #8).
#   5) if >2.5h remain: w64 phase-timing attempt — wall_deadline stops the
#      SCF in time; the per-phase build walls land in BENCH_DETAILS.json
#      either way (VERDICT #2 second half).
set -u
cd /root/repo
LOG=/root/repo/runs/tpu_queue13.log
DEADLINE=$(date -ud "2026-08-21 05:10" +%s)
echo "=== tpu_queue13 start $(date)" >> "$LOG"

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
  # git add is atomic across pathspecs: one missing file stages NOTHING,
  # so each candidate is added individually
  local f
  for f in S22_RESULTS.json RESULTS.md MP2_RESULTS.json BENCH_DETAILS.json \
           GLY_RESULTS.json ARPAE_RESULTS.json BENCH_W16_R05.json \
           BENCH_W32_DF_R05.json BENCH_W64_R05.json runs/*.log; do
    [ -e "$f" ] && git add "$f" 2>/dev/null
  done
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

# 1. w16 bench on the redesigned 3c build (cold VM: also warms the XLA
#    compile cache + writes runs/w16_B for the driver's end-of-round bench).
if [ "$(left)" -gt 24000 ]; then
  wait_chip
  echo "--- w16 DF bench $(date)" >> "$LOG"
  JCHEM_BENCH_BUDGET_S=3600 JCHEM_BENCH_NO_DOWNSHIFT=1 STALL_S=1200 \
    timeout 3900 bash tools/run_bench_nw.sh 16 W16_R05 >> "$LOG" 2>&1
  commit_artifacts
fi

# 2. w32 bench — the "first completed >=w32 on device" deliverable.
#    Resumable past the B build via df_b_cache.
if [ "$(left)" -gt 18000 ]; then
  wait_chip
  echo "--- w32 DF bench $(date)" >> "$LOG"
  W32_BUDGET=9000
  [ "$(left)" -lt 14000 ] && W32_BUDGET=$(( $(left) - 5000 ))
  JCHEM_BENCH_BUDGET_S=$W32_BUDGET JCHEM_BENCH_NO_DOWNSHIFT=1 STALL_S=1500 \
    timeout $(( W32_BUDGET + 300 )) bash tools/run_bench_nw.sh 32 W32_DF_R05 \
    >> "$LOG" 2>&1
  commit_artifacts
fi

# 3. S22 DF sweep, biggest-first (skips recorded passes; the 8 untouched
#    systems are the largest).
if [ "$(left)" -gt 3000 ]; then
  wait_chip
  echo "--- s22 df sweep (rsize) $(date)" >> "$LOG"
  S22_DF_BUDGET=$(( $(left) - 6000 ))
  [ "$S22_DF_BUDGET" -lt 2400 ] && S22_DF_BUDGET=2400
  timeout "$S22_DF_BUDGET" \
    python -u tools/run_s22_sweep.py --df-only --order=rsize --timeout=2700 \
    >> "$LOG" 2>&1
  commit_artifacts
fi

# 4. S22 conventional remainder, smallest-first, from a DF-converged guess
#    (3-5 conv iterations instead of ~20; same 1e-9 fixed point).
if [ "$(left)" -gt 2400 ]; then
  wait_chip
  echo "--- s22 conv sweep (size, df-guess) $(date)" >> "$LOG"
  S22_CONV_BUDGET=$(( $(left) - 2400 ))
  [ "$S22_CONV_BUDGET" -lt 1800 ] && S22_CONV_BUDGET=1800
  timeout "$S22_CONV_BUDGET" \
    python -u tools/run_s22_sweep.py --conv-only --order=size --df-guess \
    --timeout=2400 >> "$LOG" 2>&1
  commit_artifacts
fi

# 5. Families: gly2/gly3 and ARPA-E fig1e (DF-first; both resumable).
if [ "$(left)" -gt 1200 ]; then
  wait_chip
  echo "--- gly family $(date)" >> "$LOG"
  timeout $(( $(left) - 900 )) python -u tools/run_gly.py 2 3 >> "$LOG" 2>&1
  commit_artifacts
fi
if [ "$(left)" -gt 600 ]; then
  wait_chip
  echo "--- ARPA-E fig1e $(date)" >> "$LOG"
  timeout $(( $(left) - 300 )) python -u tools/run_arpae.py >> "$LOG" 2>&1
  commit_artifacts
fi

# 6. Opportunistic w64 phase-timing attempt (only with a large remainder;
#    wall_deadline stops the SCF before the clock, phases land in
#    BENCH_DETAILS.json and the B cache survives for the next session).
if [ "$(left)" -gt 9000 ]; then
  wait_chip
  echo "--- w64 phase-timing attempt $(date)" >> "$LOG"
  W64_BUDGET=$(( $(left) - 1200 ))
  JCHEM_BENCH_BUDGET_S=$W64_BUDGET JCHEM_BENCH_NO_DOWNSHIFT=1 STALL_S=2400 \
    timeout $(( W64_BUDGET + 300 )) bash tools/run_bench_nw.sh 64 W64_R05 \
    >> "$LOG" 2>&1
  commit_artifacts
fi

python tools/summarize_results.py >> "$LOG" 2>&1 || true
commit_artifacts
git add RESULTS.md 2>/dev/null; git commit -q -m "RESULTS.md: queue13 final summary" 2>/dev/null || true
kill "$COMMITTER" 2>/dev/null
echo "=== tpu_queue13 done $(date)" >> "$LOG"
