#!/bin/bash
# Round-3 TPU backlog, phase 4 (2026-08-18 night session).
#
# The relay chip is single-tenant: this queue is the chip's only owner and
# runs strictly sequential steps.  The CPU-backend conventional sweep
# (PALLAS_AXON_POOL_IPS unset) holds no chip claim and runs concurrently.
# Launch with setsid so the queue survives the driver session:
#   setsid nohup bash tools/tpu_queue4.sh & echo $! > /tmp/tpu_queue4.pid
#
# Order rationale:
#   1. S22 DF sweep — the main correctness gate (22/22 target); also
#      re-warms the compile cache for everything after it.
#   2. w7.6 (w64) CONVENTIONAL — the same-algorithm north-star vs the
#      reference's 2316 s / 112-thread Skylake number (VERDICT r2 item 3).
#   3. warm w16 bench — honest steady-state headline for the driver's
#      end-of-round bench (same config) to hit hot caches.
#   4. S22 conventional on-device, LARGEST first (the CPU sweep walks
#      smallest-first; resume logic merges passes from both).
#   5. w50 north-star config if time remains.
set -u
cd /root/repo
LOG=/tmp/tpu_queue4.log
DEADLINE=$(date -ud "2026-08-19 07:25" +%s)   # stop launching new work
echo "=== tpu_queue4 start $(date)" >> "$LOG"

now() { date +%s; }
left() { echo $(( DEADLINE - $(now) )); }

chip_busy() {
  local p
  for p in /proc/[0-9]*; do
    local pid=${p#/proc/}
    [ "$pid" = "$$" ] && continue
    if tr '\0' ' ' < "$p/cmdline" 2>/dev/null \
        | grep -q "run_s22_sweep\|bench\.py\|three_center\|import juliachem"; then
      if grep -qz "PALLAS_AXON_POOL_IPS=" "$p/environ" 2>/dev/null; then
        return 0
      fi
    fi
  done
  return 1
}

# 0. wait for any in-flight chip job (e.g. the S01 3-center validation)
while chip_busy; do sleep 30; done
echo "chip free $(date)" >> "$LOG"

# 1. S22 DF sweep (resumes past completed systems, retries failures)
if [ "$(left)" -gt 1200 ]; then
  echo "--- s22 df $(date)" >> "$LOG"
  timeout $(( $(left) - 600 > 18000 ? 18000 : $(left) - 600 )) \
    python -u tools/run_s22_sweep.py --df-only --order=size \
    --timeout=3600 >> "$LOG" 2>&1
fi

# 2. w7.6 (w64) conventional — same algorithm as the reference benchmark
if [ "$(left)" -gt 7200 ]; then
  echo "--- bench w64 conv $(date)" >> "$LOG"
  timeout $(( $(left) > 16200 ? 14400 : $(left) - 1800 )) \
    python -u bench.py 64 conv > /tmp/bench_w64_conv.json 2>> "$LOG"
  cp BENCH_DETAILS.json BENCH_W64_CONV.json 2>/dev/null || true
  cat /tmp/bench_w64_conv.json >> "$LOG"
fi

# 3. warm w16 bench for the driver's end-of-round run
if [ "$(left)" -gt 1800 ]; then
  echo "--- bench w16 warm $(date)" >> "$LOG"
  timeout 2400 python -u bench.py >> "$LOG" 2>&1
  cp BENCH_DETAILS.json BENCH_W16_WARM.json 2>/dev/null || true
fi

# 4. conventional sweep on-device, largest-first (complements the CPU sweep)
if [ "$(left)" -gt 2400 ]; then
  echo "--- s22 conv on-device $(date)" >> "$LOG"
  timeout $(( $(left) - 1200 )) python -u tools/run_s22_sweep.py --conv-only \
    --df-guess --order=rsize --timeout=5400 >> "$LOG" 2>&1
fi

# 5. north-star w50
if [ "$(left)" -gt 5400 ]; then
  echo "--- bench w50 $(date)" >> "$LOG"
  timeout $(( $(left) - 900 )) python -u bench.py w50 > /tmp/bench_w50.json 2>> "$LOG"
  cp BENCH_DETAILS.json BENCH_W50.json 2>/dev/null || true
  cat /tmp/bench_w50.json >> "$LOG"
fi

echo "=== tpu_queue4 done $(date)" >> "$LOG"
