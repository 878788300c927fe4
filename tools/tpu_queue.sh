#!/bin/bash
# Wait for the TPU relay to come back, then run the queued TPU workloads in
# priority order.  Logs to /tmp/tpu_queue.log.  Safe to re-run (the S22
# sweep is resume-capable and bench overwrites its artifacts).
#
# Order rationale (round 3, relay restored):
#   1. w16 bench — warms the compile cache for the driver's end-of-round run.
#   2. S22 DF sweep — fast per system (15-400 s), closes the 22/22 DF gate.
#   3. w7.6 direct (NW=64) — the north-star same-system comparison vs the
#      reference's 2316 s Skylake number (VERDICT r2 item 3).
#   4. S22 conventional sweep (df-guess accelerated), smallest systems first.
#   5. w50 north-star config.
set -u
cd /root/repo
LOG=/tmp/tpu_queue.log
echo "=== tpu_queue start $(date)" >> "$LOG"

# 1. wait for the device
while true; do
  if timeout 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready()" >> "$LOG" 2>&1; then
    echo "TPU back $(date)" >> "$LOG"
    touch /tmp/tpu_back
    break
  fi
  sleep 45
done

# 2. warm the w16 bench (the driver's end-of-round metric) first
echo "--- bench w16 $(date)" >> "$LOG"
timeout 3600 python -u bench.py >> "$LOG" 2>&1

# 3. S22 DF sweep (resumes past completed systems)
echo "--- s22 df $(date)" >> "$LOG"
timeout 18000 python -u tools/run_s22_sweep.py --df-only --order=size \
  --timeout=3600 >> "$LOG" 2>&1

# 4. w7.6 direct comparison (64 waters, reference's own benchmark system)
echo "--- bench w64 (w7.6 direct) $(date)" >> "$LOG"
timeout 14400 python -u bench.py 64 > /tmp/bench_w64.json 2>> "$LOG"
cp BENCH_DETAILS.json BENCH_W64.json 2>> "$LOG" || true
cat /tmp/bench_w64.json >> "$LOG"

# 5. S22 conventional sweep (df-guess cuts conventional iterations ~4x)
echo "--- s22 conv $(date)" >> "$LOG"
timeout 28800 python -u tools/run_s22_sweep.py --conv-only --df-guess \
  --order=size --timeout=5400 >> "$LOG" 2>&1

# 6. north-star w50
echo "--- bench w50 $(date)" >> "$LOG"
timeout 14400 python -u bench.py w50 > /tmp/bench_w50.json 2>> "$LOG"
cp BENCH_DETAILS.json BENCH_W50.json 2>> "$LOG" || true
cat /tmp/bench_w50.json >> "$LOG"

echo "=== tpu_queue done $(date)" >> "$LOG"
