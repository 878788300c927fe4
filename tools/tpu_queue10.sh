#!/bin/bash
# Round-4 TPU backlog, phase 10 (2026-08-19 ~16:00 UTC) — supersedes queue9.
#
# State when written: w16 bench on the redesigned 3c build PASSED (0.94
# s/iter f64 steady, BENCH_W16_R04.json); w32 bench in flight (stream-mode
# B=9.7 GB — its f64 iterations are the first ground-truth measurement of
# relay h2d streaming); metric-fold fix landed (S01/S17 DF now pass on CPU);
# B disk cache landed (w64 build survives VM recycles).
#
# Stages (artifacts commit as they land; each stage waits for a free chip):
#   1. w7.6 (w64) DF north-star — THE round-4 target.  bench.py 64 caches
#      B under runs/w64_B*, so a VM recycle mid-run resumes past the build.
#   2. S22 DF sweep on TPU, BIGGEST-first (the CPU sweep runs smallest-first
#      concurrently; the merge-before-each-system logic in run_s22_sweep.py
#      keeps both sets of passes).
#   3. ARPA-E fig1e DF vs the committed reference golden (-903.7991936826).
#   4. S22 conventional sweep for whatever remains.
# Artifacts are written ONLY on success (run_bench_nw.sh; the sweep records
# honest per-system results itself).
set -u
cd /root/repo
LOG=/root/repo/runs/tpu_queue10.log
DEADLINE=$(date -ud "2026-08-20 00:45" +%s)
echo "=== tpu_queue10 start $(date)" >> "$LOG"

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
          BENCH_W32_DF.json BENCH_W64_DF.json BENCH_W16_R04.json \
          ARPAE_RESULTS.json runs/*.log runs/*.json 2>/dev/null
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

# 1. w64 north-star (resumable via the B disk cache)
if [ "$(left)" -gt 9000 ]; then
  wait_chip
  echo "--- w64 DF north-star $(date)" >> "$LOG"
  W64_BUDGET=$(( $(left) - 5400 ))
  [ "$W64_BUDGET" -gt 27000 ] && W64_BUDGET=27000
  timeout "$W64_BUDGET" bash tools/run_bench_nw.sh 64 W64_DF >> "$LOG" 2>&1
  commit_artifacts
fi

# 2. S22 DF sweep on TPU, biggest-first (CPU sweep covers smallest-first)
if [ "$(left)" -gt 2400 ]; then
  wait_chip
  echo "--- s22 df sweep (rsize) $(date)" >> "$LOG"
  timeout $(( $(left) - 1800 )) \
    python -u tools/run_s22_sweep.py --df-only --order=rsize --timeout=4200 \
    >> "$LOG" 2>&1
  commit_artifacts
fi

# 3. ARPA-E fig1e DF vs committed reference golden
if [ "$(left)" -gt 3000 ]; then
  wait_chip
  echo "--- arpa-e fig1e df $(date)" >> "$LOG"
  timeout $(( $(left) - 900 )) python -u tools/run_arpae.py >> "$LOG" 2>&1
  commit_artifacts
fi

# 4. S22 conventional for the remainder
if [ "$(left)" -gt 2400 ]; then
  wait_chip
  echo "--- s22 conv sweep (rsize) $(date)" >> "$LOG"
  timeout $(( $(left) - 600 )) \
    python -u tools/run_s22_sweep.py --conv-only --order=rsize --timeout=4200 \
    >> "$LOG" 2>&1
  commit_artifacts
fi

commit_artifacts
kill "$COMMITTER" 2>/dev/null
echo "=== tpu_queue10 done $(date)" >> "$LOG"
