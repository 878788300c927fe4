#!/bin/bash
# Round-4 TPU backlog, phase 11 (2026-08-19 ~20:30 UTC) — supersedes queue10
# after the 19:27 VM recycle killed it mid-sweep.
#
# State when written: w16 bench PASSED (0.94 s/iter, BENCH_W16_R04.json);
# S22 DF 14/14 attempted PASS, 8 systems never attempted (6,7,13,14,15,
# 20,21,22); conv 11 pass, S05/S11/S12 + the 8 above missing; the w64 run
# died at the metric fold (unblocked [10752,10752]x[10752,16384] emulated-
# f64 kernel needs >16 GB of operand temps) — fixed by row+col fold
# blocking in models/linalg.py, probed OOM-free at the exact shapes.
#
# Priorities (VERDICT r3): 1) first-ever completed w32 on device,
# 2) S22 DF toward 22/22, 3) ARPA-E fig1e, 4) conv remainder.
# w64 direct is arithmetic-infeasible this session: 3c build 2.4 h
# (measured) + fold d2h ~1 h + ~25 iterations x 279 s h2d stream (60 GB
# B over the 0.215 GB/s relay) ~ 2 h > time left when combined; the
# honest cost model goes in ROADMAP.md instead.
set -u
cd /root/repo
LOG=/root/repo/runs/tpu_queue11.log
DEADLINE=$(date -ud "2026-08-20 02:20" +%s)
echo "=== tpu_queue11 start $(date)" >> "$LOG"

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
if [ "$(left)" -gt 5400 ]; then
  wait_chip
  echo "--- w32 DF bench $(date)" >> "$LOG"
  W32_BUDGET=$(( $(left) - 3600 ))
  [ "$W32_BUDGET" -gt 10800 ] && W32_BUDGET=10800
  timeout "$W32_BUDGET" bash tools/run_bench_nw.sh 32 W32_DF >> "$LOG" 2>&1
  commit_artifacts
fi

# 2. S22 DF sweep, biggest-first (skips recorded passes; the 8 untouched
#    systems are the largest).
if [ "$(left)" -gt 2400 ]; then
  wait_chip
  echo "--- s22 df sweep (rsize) $(date)" >> "$LOG"
  timeout $(( $(left) - 2100 )) \
    python -u tools/run_s22_sweep.py --df-only --order=rsize --timeout=3000 \
    >> "$LOG" 2>&1
  commit_artifacts
fi

# 3. ARPA-E fig1e DF vs committed reference golden
if [ "$(left)" -gt 2700 ]; then
  wait_chip
  echo "--- arpa-e fig1e df $(date)" >> "$LOG"
  timeout $(( $(left) - 900 )) python -u tools/run_arpae.py >> "$LOG" 2>&1
  commit_artifacts
fi

# 4. S22 conventional remainder, smallest-first (banks S05/S11/S12 before
#    attempting the big stacks).
if [ "$(left)" -gt 1800 ]; then
  wait_chip
  echo "--- s22 conv sweep (size) $(date)" >> "$LOG"
  timeout $(( $(left) - 300 )) \
    python -u tools/run_s22_sweep.py --conv-only --order=size --timeout=4200 \
    >> "$LOG" 2>&1
  commit_artifacts
fi

commit_artifacts
kill "$COMMITTER" 2>/dev/null
echo "=== tpu_queue11 done $(date)" >> "$LOG"
