#!/bin/bash
# Round-3 TPU backlog, phase 2 — runs after the 12:48 UTC DF sweep.
#
# The relay chip is single-tenant (two concurrent processes corrupt each
# other's device buffers), so everything here is strictly sequential and
# waits for any in-flight sweep first.  Hard deadline keeps the chip free
# for the driver's end-of-round bench run.
#
# Order rationale:
#   1. warm w16 bench — honest steady-state headline with the canonical-chunk
#      3-center kernels + warm cache; also the decision input for w64 cost.
#   2. w7.6 direct (NW=64) — the north-star same-system comparison vs the
#      reference's 2316 s Skylake number (VERDICT r2 item 3).
#   3. S22 conventional sweep on-device (df-guess) with remaining time.
#   4. w50 north-star config if time remains.
set -u
cd /root/repo
LOG=/tmp/tpu_queue2.log
DEADLINE=$(date -ud "19:30" +%s)    # stop launching new work
PREEMPT=$(date -ud "16:30" +%s)     # preempt a still-running DF sweep
echo "=== tpu_queue2 start $(date)" >> "$LOG"

now() { date +%s; }
left() { echo $(( DEADLINE - $(now) )); }

busy() {
  local p
  for p in /proc/[0-9]*/cmdline; do
    if tr '\0' ' ' < "$p" 2>/dev/null \
        | grep -q "run_s22_sweep\|bench\.py\|run_mp2"; then
      return 0
    fi
  done
  return 1
}

# 1. wait for the in-flight DF sweep; preempt it at PREEMPT so the
#    north-star benchmarks are guaranteed chip time (per-system results are
#    already on disk; only the in-flight system is lost and the sweep resumes)
while busy; do
  if [ "$(now)" -ge "$PREEMPT" ] && [ -f /tmp/s22_df.pid ]; then
    SW=$(cat /tmp/s22_df.pid)
    echo "preempting DF sweep pid $SW $(date)" >> "$LOG"
    # the per-system child interpreter holds the chip — kill it by explicit
    # parent->child lookup (never by pattern), then the sweep driver
    KIDS=$(cat /proc/"$SW"/task/*/children 2>/dev/null || true)
    kill "$SW" 2>/dev/null || true
    for k in $KIDS; do kill "$k" 2>/dev/null || true; done
    DF_PREEMPTED=1
    sleep 10
    break
  fi
  sleep 30
done
while busy; do sleep 10; done
echo "chip free $(date)" >> "$LOG"

# 2. warm w16 bench (the driver's end-of-round metric)
if [ "$(left)" -gt 900 ]; then
  echo "--- bench w16 warm $(date)" >> "$LOG"
  timeout $(( $(left) > 3600 ? 3600 : $(left) )) python -u bench.py >> "$LOG" 2>&1
  cp BENCH_DETAILS.json BENCH_W16_WARM.json 2>/dev/null || true
fi

# 3. w7.6 direct comparison (64 waters, the reference's own benchmark system)
if [ "$(left)" -gt 5400 ]; then
  echo "--- bench w64 (w7.6 direct) $(date)" >> "$LOG"
  timeout $(( $(left) > 12600 ? 12600 : $(left) - 600 )) \
    python -u bench.py 64 > /tmp/bench_w64.json 2>> "$LOG"
  cp BENCH_DETAILS.json BENCH_W64.json 2>/dev/null || true
  cat /tmp/bench_w64.json >> "$LOG"
fi

# 3b. if the DF sweep was preempted, give it the remaining time first
if [ "${DF_PREEMPTED:-0}" = "1" ] && [ "$(left)" -gt 1800 ]; then
  echo "--- s22 df resume $(date)" >> "$LOG"
  timeout $(( $(left) - 900 )) python -u tools/run_s22_sweep.py --df-only \
    --order=size --timeout=3600 >> "$LOG" 2>&1
fi

# 4. S22 conventional sweep on-device (df-guess cuts iterations ~4x)
if [ "$(left)" -gt 1200 ]; then
  echo "--- s22 conv $(date)" >> "$LOG"
  timeout $(( $(left) - 300 )) python -u tools/run_s22_sweep.py --conv-only \
    --df-guess --order=size --timeout=3600 >> "$LOG" 2>&1
fi

# 5. north-star w50 (only if a surprising amount of time remains)
if [ "$(left)" -gt 5400 ]; then
  echo "--- bench w50 $(date)" >> "$LOG"
  timeout $(( $(left) - 600 )) python -u bench.py w50 \
    > /tmp/bench_w50.json 2>> "$LOG"
  cp BENCH_DETAILS.json BENCH_W50.json 2>/dev/null || true
  cat /tmp/bench_w50.json >> "$LOG"
fi

echo "=== tpu_queue2 done $(date)" >> "$LOG"
