"""Post-process a timings JSON dump (parity with reference
tools/analyze/analyze_timings.jl): per-phase totals, per-iteration table,
fock-build breakdown.

Usage: python tools/analyze_timings.py timings.json
"""

import json
import re
import sys
from collections import defaultdict


def analyze(path: str) -> None:
    with open(path) as f:
        data = json.load(f)
    timings = data["timings"]
    print(f"run: {data.get('run_name')}  converged: {data.get('converged')}  "
          f"E = {data.get('scf_energy')}")
    print(f"total run time: {data.get('run_time', 0):.2f} s")

    per_iter = defaultdict(dict)
    phase_totals = defaultdict(float)
    for key, val in timings.items():
        m = re.match(r"(.+)-(\d+)$", key)
        if m:
            per_iter[int(m.group(2))][m.group(1)] = val
            phase_totals[m.group(1)] += val
        else:
            phase_totals[key] += val

    print("\nphase totals (s):")
    for k, v in sorted(phase_totals.items(), key=lambda kv: -kv[1]):
        print(f"  {k:32s} {v:10.3f}")

    if per_iter:
        keys = sorted({k for d in per_iter.values() for k in d})
        print("\nper-iteration:")
        print("  it  " + "".join(f"{k[:14]:>15s}" for k in keys))
        for it in sorted(per_iter):
            row = per_iter[it]
            print(f"  {it:3d} " + "".join(f"{row.get(k, 0.0):15.3f}" for k in keys))


if __name__ == "__main__":
    analyze(sys.argv[1])
