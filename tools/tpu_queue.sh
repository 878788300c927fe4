#!/bin/bash
# Wait for the TPU relay to come back, then run the queued TPU workloads in
# priority order.  Logs to /tmp/tpu_queue.log.  Safe to re-run (the S22
# sweep is resume-capable and bench overwrites its artifacts).
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

# 3. S22 conventional sweep (resumes past CPU-completed systems)
echo "--- s22 conv $(date)" >> "$LOG"
timeout 28800 python -u tools/run_s22_sweep.py --conv-only >> "$LOG" 2>&1

# 4. S22 DF sweep
echo "--- s22 df $(date)" >> "$LOG"
timeout 14400 python -u tools/run_s22_sweep.py --df-only >> "$LOG" 2>&1

# 5. north-star w50
echo "--- bench w50 $(date)" >> "$LOG"
timeout 14400 python -u bench.py w50 >> "$LOG" 2>&1
cp BENCH_DETAILS.json BENCH_W50.json 2>> "$LOG"

echo "=== tpu_queue done $(date)" >> "$LOG"
