#!/bin/bash
# Round-3 TPU backlog, phase 9 (2026-08-19 ~03:40 UTC) — supersedes queue7/8.
#
# Findings that set this plan:
#   - w64 CONVENTIONAL is infeasible on this host (multi-TB host index
#     streams; tools/estimate_conv_quartets.py: 0.8 GB @ w8, 16.7 GB @ w16,
#     ~20x per doubling).  The same-system w7.6 north-star must ride the DF
#     path: build_B_packed already assembles host-RAM B out-of-core
#     (HUGE_BUILD_BUDGET) and the Fock build streams host B per iteration.
#   - Whether streaming ~50 GB of B per f64 iteration is minutes or hours is
#     set by relay h2d bandwidth — measured by stage 3 and gating stage 6.
# Stages (artifacts commit as they land):
#   1. wait out the in-flight COLD w16 bench; keep artifact
#   2. WARM w16 bench (driver's end-of-round metric hits this cache)
#   3. relay bandwidth probe
#   4. w32 DF bench — a measured same-algorithm point beyond w16, cheap
#   5. S22 DF sweep smallest-first until T_W64
#   6. w7.6 (w64) DF north-star if h2d >= 0.4 GB/s
#   7. S22 DF sweep resume with the remainder
set -u
cd /root/repo
LOG=/root/repo/tpu_queue9.log
DEADLINE=$(date -ud "2026-08-19 14:00" +%s)
T_W64=$(date -ud "2026-08-19 09:40" +%s)
echo "=== tpu_queue9 start $(date)" >> "$LOG"

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
  git add S22_RESULTS.json RESULTS.md MP2_RESULTS.json RELAY_BANDWIDTH.json \
          BENCH_W16_COLD.json BENCH_W16_WARM.json BENCH_W32_DF.json \
          BENCH_W64_DF.json bench_w32_df.out bench_w64_df.out \
          BENCH_DETAILS.json tpu_queue9.log 2>/dev/null
  if ! git diff --cached --quiet 2>/dev/null; then
    git commit -q -m "TPU queue artifacts (auto-commit as they land)" \
      || true
  fi
}

(
  while sleep 600; do
    kill -0 "$$" 2>/dev/null || exit 0
    commit_artifacts
  done
) &
COMMITTER=$!

# 1+2. cold w16 bench in flight -> then warm w16 bench
while chip_busy; do sleep 20; done
cp BENCH_DETAILS.json BENCH_W16_COLD.json 2>/dev/null || true
echo "--- bench w16 warm $(date)" >> "$LOG"
timeout 2400 python -u bench.py >> "$LOG" 2>&1
cp BENCH_DETAILS.json BENCH_W16_WARM.json 2>/dev/null || true
commit_artifacts

# 3. relay bandwidth probe
while chip_busy; do sleep 20; done
echo "--- relay bandwidth probe $(date)" >> "$LOG"
timeout 900 python -u tools/probe_relay_bandwidth.py >> "$LOG" 2>&1
commit_artifacts

# 4. w32 DF bench
if [ "$(left)" -gt 5000 ]; then
  while chip_busy; do sleep 20; done
  echo "--- bench w32 df $(date)" >> "$LOG"
  timeout 4500 python -u bench.py 32 > /root/repo/bench_w32_df.out 2>> "$LOG"
  cp BENCH_DETAILS.json BENCH_W32_DF.json 2>/dev/null || true
  cat /root/repo/bench_w32_df.out >> "$LOG"
  commit_artifacts
fi

# 5. S22 DF sweep until the w64 window opens
SWEEP_LEFT=$(( T_W64 - $(now) ))
if [ "$SWEEP_LEFT" -gt 1200 ]; then
  while chip_busy; do sleep 20; done
  echo "--- s22 df sweep until T_W64 $(date)" >> "$LOG"
  timeout "$SWEEP_LEFT" \
    python -u tools/run_s22_sweep.py --df-only --order=size --timeout=3600 \
    >> "$LOG" 2>&1
  commit_artifacts
fi

# 6. w7.6 (w64) DF north-star, gated on measured bandwidth
H2D=$(python -c "
import json
try: print(json.load(open('RELAY_BANDWIDTH.json'))['h2d_GBps'])
except Exception: print(0)" 2>/dev/null)
OK=$(python -c "print(1 if float('$H2D' or 0) >= 0.4 else 0)")
if [ "$OK" = "1" ] && [ "$(left)" -gt 7200 ]; then
  while chip_busy; do sleep 20; done
  echo "--- bench w64 df (h2d=${H2D} GB/s) $(date)" >> "$LOG"
  timeout $(( $(left) - 1500 )) \
    python -u bench.py 64 > /root/repo/bench_w64_df.out 2>> "$LOG"
  cp BENCH_DETAILS.json BENCH_W64_DF.json 2>/dev/null || true
  cat /root/repo/bench_w64_df.out >> "$LOG"
  commit_artifacts
else
  echo "--- skipping w64 df (h2d=${H2D} GB/s, left=$(left)s) $(date)" >> "$LOG"
fi

# 7. sweep resume with the remainder
if [ "$(left)" -gt 1200 ]; then
  while chip_busy; do sleep 20; done
  echo "--- s22 df resume $(date)" >> "$LOG"
  timeout $(( $(left) - 300 )) \
    python -u tools/run_s22_sweep.py --df-only --order=size --timeout=3600 \
    >> "$LOG" 2>&1
  commit_artifacts
fi

commit_artifacts
kill "$COMMITTER" 2>/dev/null
echo "=== tpu_queue9 done $(date)" >> "$LOG"
