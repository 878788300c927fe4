#!/bin/bash
# Run bench.py for NW waters; write labeled artifact ONLY on rc=0.
# Usage: run_bench_nw.sh <NW> <LABEL> [extra bench args]
set -u
NW="$1"; LABEL="$2"; shift 2
cd /root/repo
LOG="runs/bench_${LABEL}.log"
timeout 21000 python bench.py "$NW" "$@" >"runs/bench_${LABEL}.json.tmp" 2>"$LOG"
rc=$?
if [ $rc -eq 0 ] && [ -s "runs/bench_${LABEL}.json.tmp" ]; then
  python - "$LABEL" "$NW" <<'PY'
import json, sys
label, nw = sys.argv[1], sys.argv[2]
line = open(f"runs/bench_{label}.json.tmp").read().strip().splitlines()[-1]
out = json.loads(line)
det = json.load(open("BENCH_DETAILS.json"))
det["config"] = {"nw": int(nw), "label": label, "basis": "6-31+G*",
                 "aux": "cc-pVTZ-JKFIT"}
json.dump(det, open(f"BENCH_{label}.json", "w"), indent=1)
print(json.dumps(out))
PY
  git add "BENCH_${LABEL}.json" "$LOG" 2>/dev/null
  git commit -q -m "TPU bench artifact: ${LABEL} completed (rc=0)" 2>/dev/null
else
  echo "bench ${LABEL} FAILED rc=$rc" >> "$LOG"
  git add "$LOG" 2>/dev/null
  git commit -q -m "TPU bench log: ${LABEL} failed rc=$rc" 2>/dev/null
fi
exit $rc
