#!/bin/bash
# Run bench.py for NW waters; write labeled artifact ONLY on rc=0.
# Usage: run_bench_nw.sh <NW> <LABEL> [extra bench args]
#
# Stall watchdog: the relay can drop an in-flight op without any error
# surfacing host-side (observed 2026-08-19: w64 3c build silent 1h+, zero
# CPU, zero socket traffic).  bench runs now emit heartbeats (eri3c launch
# progress, build_B_packed phase banners, per-iteration SCF lines), so a
# log silent for STALL_S seconds means a hung relay op: kill that PID and
# retry ONCE (the df_b_cache makes a post-build retry resume past the
# build instead of repeating it).
set -u
NW="$1"; LABEL="$2"; shift 2
cd /root/repo
LOG="runs/bench_${LABEL}.log"
TMP="runs/bench_${LABEL}.json.tmp"
STALL_S=${STALL_S:-2700}

run_once() {
  timeout 21000 python bench.py "$NW" "$@" >"$TMP" 2>>"$LOG" &
  local pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    local age=$(( $(date +%s) - $(stat -c %Y "$LOG" 2>/dev/null || date +%s) ))
    if [ "$age" -gt "$STALL_S" ]; then
      echo "# watchdog: log silent ${age}s > ${STALL_S}s; killing $pid" >> "$LOG"
      kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      return 99
    fi
  done
  wait "$pid"
}

run_once "$@"
rc=$?
if [ $rc -eq 99 ]; then
  echo "# watchdog: retrying ${LABEL} once after stall" >> "$LOG"
  run_once "$@"
  rc=$?
fi
if [ $rc -eq 0 ] && [ -s "$TMP" ]; then
  python - "$LABEL" "$NW" <<'PY'
import json, sys
label, nw = sys.argv[1], sys.argv[2]
line = open(f"runs/bench_{label}.json.tmp").read().strip().splitlines()[-1]
out = json.loads(line)
# refuse to stamp the label onto a reduced CPU-fallback run (bench.py
# falls back to w4/CPU when the relay is down — VERDICT r3 weak #2)
if str(out.get("nw")) != str(int(nw)) or out.get("platform") != "tpu":
    dest = f"BENCH_{label}_fallback.json"
else:
    dest = f"BENCH_{label}.json"
det = json.load(open("BENCH_DETAILS.json"))
det["config"] = {"nw": int(nw), "label": label, "basis": "6-31+G*",
                 "aux": "cc-pVTZ-JKFIT", "actual_nw": out.get("nw"),
                 "platform": out.get("platform")}
json.dump(det, open(dest, "w"), indent=1)
print(json.dumps(out))
PY
  # NB: git add is atomic across pathspecs — one missing file stages
  # NOTHING (this silently dropped every label commit until round 5).
  for f in "BENCH_${LABEL}.json" "BENCH_${LABEL}_fallback.json" "$LOG"; do
    [ -e "$f" ] && git add "$f" 2>/dev/null
  done
  git commit -q -m "TPU bench artifact: ${LABEL} completed (rc=0)" 2>/dev/null
else
  echo "bench ${LABEL} FAILED rc=$rc" >> "$LOG"
  git add "$LOG" 2>/dev/null
  git commit -q -m "TPU bench log: ${LABEL} failed rc=$rc" 2>/dev/null
fi
exit $rc
