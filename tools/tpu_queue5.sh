#!/bin/bash
# Round-3 TPU backlog, phase 5 (2026-08-18 night, corrected tenancy gate).
#
# Replaces tpu_queue4.sh: the chip-busy check now uses the boot-environment
# claimant rule (tools/chip_claimants.sh logic) instead of command-line
# patterns, after an unmatched debug script overlapped the DF sweep and
# corrupted S01 (E=-4.6e13).  Also adds a SECOND DF pass to retry any
# system that failed in the first (resume logic skips passes).
#
# Launch detached:  setsid nohup bash tools/tpu_queue5.sh &
set -u
cd /root/repo
LOG=/tmp/tpu_queue5.log
DEADLINE=$(date -ud "2026-08-19 07:25" +%s)   # stop launching new work
echo "=== tpu_queue5 start $(date)" >> "$LOG"

now() { date +%s; }
left() { echo $(( DEADLINE - $(now) )); }

chip_busy() {
  local p pid cmd
  for p in /proc/[0-9]*; do
    pid=${p#/proc/}
    [ "$pid" = "$$" ] && continue
    cmd=$(tr '\0' ' ' < "$p/cmdline" 2>/dev/null)
    case "$cmd" in
      *python*) ;;
      *) continue ;;
    esac
    case "$cmd" in
      *tpu_init*) continue ;;
    esac
    if grep -qz "PALLAS_AXON_POOL_IPS=" "$p/environ" 2>/dev/null; then
      return 0
    fi
  done
  return 1
}

run_step() {  # run_step <max_seconds> <label> <cmd...>
  local cap=$1 label=$2; shift 2
  while chip_busy; do sleep 20; done
  echo "--- $label $(date)" >> "$LOG"
  timeout "$cap" "$@" >> "$LOG" 2>&1
}

# 1. S22 DF sweep, then a retry pass for anything that failed
if [ "$(left)" -gt 1200 ]; then
  run_step $(( $(left) - 600 > 16200 ? 16200 : $(left) - 600 )) "s22 df" \
    python -u tools/run_s22_sweep.py --df-only --order=size --timeout=3600
fi
if [ "$(left)" -gt 1800 ]; then
  run_step 3700 "s22 df retry pass" \
    python -u tools/run_s22_sweep.py --df-only --order=size --timeout=3600
fi

# 2. w7.6 (w64) conventional — same algorithm as the reference benchmark
if [ "$(left)" -gt 7200 ]; then
  while chip_busy; do sleep 20; done
  echo "--- bench w64 conv $(date)" >> "$LOG"
  timeout $(( $(left) > 16200 ? 14400 : $(left) - 1800 )) \
    python -u bench.py 64 conv > /tmp/bench_w64_conv.json 2>> "$LOG"
  cp BENCH_DETAILS.json BENCH_W64_CONV.json 2>/dev/null || true
  cat /tmp/bench_w64_conv.json >> "$LOG"
fi

# 3. warm w16 bench for the driver's end-of-round run
if [ "$(left)" -gt 1800 ]; then
  run_step 2400 "bench w16 warm" python -u bench.py
  cp BENCH_DETAILS.json BENCH_W16_WARM.json 2>/dev/null || true
fi

# 4. conventional sweep on-device, largest-first (complements the CPU sweep)
if [ "$(left)" -gt 2400 ]; then
  run_step $(( $(left) - 1200 )) "s22 conv on-device" \
    python -u tools/run_s22_sweep.py --conv-only --df-guess --order=rsize \
    --timeout=5400
fi

# 5. north-star w50
if [ "$(left)" -gt 5400 ]; then
  while chip_busy; do sleep 20; done
  echo "--- bench w50 $(date)" >> "$LOG"
  timeout $(( $(left) - 900 )) python -u bench.py w50 > /tmp/bench_w50.json 2>> "$LOG"
  cp BENCH_DETAILS.json BENCH_W50.json 2>/dev/null || true
  cat /tmp/bench_w50.json >> "$LOG"
fi

echo "=== tpu_queue5 done $(date)" >> "$LOG"
