#!/bin/bash
# Round-3 TPU backlog, phase 7 — fresh-VM restart (2026-08-19 ~03:00 UTC).
#
# The 02:21 VM recycle killed tpu_queue6 mid-flight and wiped /tmp and the
# XLA compile cache; the w64-conv north-star output (stage 2 of queue6) was
# lost.  Re-run the backlog with the lessons applied:
#   - every artifact lands inside /root/repo and is committed as it lands
#     (a background committer, not end-of-stage only),
#   - stage order: warm w16 bench (re-warms the compile cache the driver's
#     end-of-round bench will hit), w64 conventional north-star (the
#     same-algorithm comparison vs the reference's 2316 s Skylake w7.6 run),
#     then the S22 DF sweep smallest-first, then remaining conventional.
#
# Launch detached: setsid nohup bash tools/tpu_queue7.sh & echo $! > /tmp/q7.pid
set -u
cd /root/repo
LOG=/root/repo/tpu_queue7.log
DEADLINE=$(date -ud "2026-08-19 14:00" +%s)
echo "=== tpu_queue7 start $(date)" >> "$LOG"

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
  # commit sweep/bench artifacts as they land so a VM recycle cannot lose
  # them again (lesson from 2026-08-18, TPU_OUTAGE_r03.md)
  git add S22_RESULTS.json RESULTS.md MP2_RESULTS.json \
          BENCH_W64_CONV.json BENCH_W16_WARM.json BENCH_DETAILS.json \
          tpu_queue7.log 2>/dev/null
  if ! git diff --cached --quiet 2>/dev/null; then
    git commit -q -m "TPU queue artifacts (auto-commit as they land)" \
      || true
  fi
}

# background committer: every 10 min while the queue lives
(
  while sleep 600; do
    kill -0 "$$" 2>/dev/null || exit 0
    commit_artifacts
  done
) &
COMMITTER=$!

# 1. w16 bench — re-warms the compile cache lost with the VM
while chip_busy; do sleep 20; done
echo "--- bench w16 (cache warm-up) $(date)" >> "$LOG"
timeout 3600 python -u bench.py >> "$LOG" 2>&1
cp BENCH_DETAILS.json BENCH_W16_WARM.json 2>/dev/null || true
commit_artifacts

# 2. w7.6 (w64) conventional north-star
if [ "$(left)" -gt 4000 ]; then
  while chip_busy; do sleep 20; done
  echo "--- bench w64 conv $(date)" >> "$LOG"
  timeout 10800 python -u bench.py 64 conv > /root/repo/bench_w64_conv.out 2>> "$LOG"
  cp BENCH_DETAILS.json BENCH_W64_CONV.json 2>/dev/null || true
  cat /root/repo/bench_w64_conv.out >> "$LOG"
  git add bench_w64_conv.out BENCH_W64_CONV.json 2>/dev/null
  commit_artifacts
fi

# 3. S22 DF sweep, smallest-first (resume-capable, updates S22_RESULTS.json
#    per system)
if [ "$(left)" -gt 1200 ]; then
  while chip_busy; do sleep 20; done
  echo "--- s22 df resume $(date)" >> "$LOG"
  timeout $(( $(left) > 18000 ? 18000 : $(left) - 300 )) \
    python -u tools/run_s22_sweep.py --df-only --order=size --timeout=3600 \
    >> "$LOG" 2>&1
  commit_artifacts
fi

# 4. remaining conventional systems with whatever is left
if [ "$(left)" -gt 1200 ]; then
  while chip_busy; do sleep 20; done
  echo "--- s22 conv resume $(date)" >> "$LOG"
  timeout $(( $(left) - 300 )) \
    python -u tools/run_s22_sweep.py --conv-only --order=size --timeout=5400 \
    >> "$LOG" 2>&1
  commit_artifacts
fi

commit_artifacts
kill "$COMMITTER" 2>/dev/null
echo "=== tpu_queue7 done $(date)" >> "$LOG"
