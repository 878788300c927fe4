#!/bin/bash
# Round-3 TPU backlog, phase 3 (2026-08-18 afternoon session).
#
# The relay chip is single-tenant: everything here is strictly sequential
# and waits for the in-flight DF sweep.  The CPU-backend conventional sweep
# (launched with PALLAS_AXON_POOL_IPS unset) holds no chip claim and runs
# concurrently by design.
#
# Order rationale:
#   1. wait for the DF S22 sweep (the main correctness gate).
#   2. w7.6 direct (NW=64) CONVENTIONAL — the same-algorithm north-star
#      comparison vs the reference's 2316 s Skylake number.
#   3. S22 conventional sweep on-device, LARGEST systems first (the CPU
#      sweep walks smallest-first; resume logic skips whatever either
#      sweep already passed).
#   4. warm w16 bench so the driver's end-of-round bench hits a hot cache.
set -u
cd /root/repo
LOG=/tmp/tpu_queue3.log
DEADLINE=$(date -ud "2026-08-19 00:45" +%s)   # stop launching new work
echo "=== tpu_queue3 start $(date)" >> "$LOG"

now() { date +%s; }
left() { echo $(( DEADLINE - $(now) )); }

chip_busy() {
  local p
  for p in /proc/[0-9]*; do
    local pid=${p#/proc/}
    [ "$pid" = "$$" ] && continue
    if tr '\0' ' ' < "$p/cmdline" 2>/dev/null \
        | grep -q "run_s22_sweep\|bench\.py\|run_mp2"; then
      # CPU-backend runs (no PALLAS_AXON_POOL_IPS) hold no chip claim
      if grep -qz "PALLAS_AXON_POOL_IPS=" "$p/environ" 2>/dev/null; then
        return 0
      fi
    fi
  done
  return 1
}

# 1. wait for the in-flight DF sweep
while chip_busy; do sleep 30; done
echo "chip free $(date)" >> "$LOG"

# 2. w7.6 (w64) conventional — same algorithm as the reference benchmark
if [ "$(left)" -gt 7200 ]; then
  echo "--- bench w64 conv $(date)" >> "$LOG"
  timeout $(( $(left) > 14400 ? 14400 : $(left) - 1800 )) \
    python -u bench.py 64 conv > /tmp/bench_w64_conv.json 2>> "$LOG"
  cp BENCH_DETAILS.json BENCH_W64_CONV.json 2>/dev/null || true
  cat /tmp/bench_w64_conv.json >> "$LOG"
fi

# 3. conventional sweep on-device, largest-first (complements the CPU sweep)
if [ "$(left)" -gt 2400 ]; then
  echo "--- s22 conv on-device $(date)" >> "$LOG"
  timeout $(( $(left) - 1500 )) python -u tools/run_s22_sweep.py --conv-only \
    --df-guess --order=rsize --timeout=5400 >> "$LOG" 2>&1
fi

# 4. warm w16 bench for the driver's end-of-round run
if [ "$(left)" -gt 600 ]; then
  echo "--- bench w16 warm $(date)" >> "$LOG"
  timeout $(( $(left) > 2400 ? 2400 : $(left) )) python -u bench.py >> "$LOG" 2>&1
  cp BENCH_DETAILS.json BENCH_W16_WARM.json 2>/dev/null || true
fi

echo "=== tpu_queue3 done $(date)" >> "$LOG"
