#!/bin/bash
# Round-5 remaining chip plan v2: fig1e (golden-gated, raw-checkpointed)
# under a realistic timeout, then the S22 DF remainder smallest-first,
# releasing the chip before the driver's end-of-round bench.
set -u
cd /root/repo
LOG=/root/repo/runs/tpu_queue13.log
DEADLINE=$(date -ud "2026-08-21 05:05" +%s)
left() { echo $(( DEADLINE - $(date +%s) )); }
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
  local f
  for f in S22_RESULTS.json RESULTS.md ARPAE_RESULTS.json GLY_RESULTS.json \
           MP2_RESULTS.json BENCH_DETAILS.json runs/tpu_queue13.log; do
    [ -e "$f" ] && git add "$f" 2>/dev/null
  done
  git commit -q -m "TPU queue artifacts (auto-commit as they land)" 2>/dev/null || true
}

echo "=== post_w32_plan v2 start $(date)" >> "$LOG"
wait_chip
if [ "$(left)" -gt 3900 ]; then
  echo "--- ARPA-E fig1e (t=3600) $(date)" >> "$LOG"
  timeout 3600 python -u tools/run_arpae.py >> "$LOG" 2>&1
  commit_artifacts
fi
wait_chip
if [ "$(left)" -gt 1500 ]; then
  echo "--- s22 df remainder (size order) $(date)" >> "$LOG"
  timeout $(( $(left) - 300 )) \
    python -u tools/run_s22_sweep.py --df-only --order=size --timeout=2400 \
    >> "$LOG" 2>&1
  commit_artifacts
fi
python tools/summarize_results.py >> "$LOG" 2>&1 || true
commit_artifacts
echo "=== post_w32_plan v2 done $(date)" >> "$LOG"
