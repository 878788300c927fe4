"""RI-MP2 on S22 systems -> MP2_RESULTS.json.

The reference's committed goldens (test/s22_gamess_values.json) carry RHF
data only, so there is no external MP2 oracle in this environment; the
recorded numbers are our RI-MP2 (cc-pVTZ-JKFIT / AutoAux fitting) on the
reference inputs, with the RI-vs-exact-MP2 agreement (<5e-4 Eh) pinned by
tests/test_mp2.py.  Each system runs in a fresh interpreter.

Usage: python tools/run_mp2_s22.py [system ...]   (default: 2 1 8)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

_CODE = """
import json, warnings
from juliachem_jl_tpu import basis, io, molecule
from juliachem_jl_tpu.basis import CalculationBasisSets
from juliachem_jl_tpu.models import mp2, rhf

spec = io.read_input("{ref}/example_inputs/S22/{imol:02d}_MP2.json")
mol = molecule.from_input_dict(spec.molecule)
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    bsets = CalculationBasisSets(
        basis.build(mol, spec.model["basis"]),
        basis.build_auxiliary(mol, "cc-pVTZ-JKFIT", spec.model["basis"]),
    )
res = rhf.energy(mol, bsets, {{"scf_type": "df", "niter": 60, "dele": 1e-9,
                               "rmsd": 1e-7, "guess": "sad"}})
assert res["Converged?"]
out = mp2.ri_mp2_energy(res, bsets)
print("RESULT:" + json.dumps({{
    "E_rhf": res["Energy"], "E2": out["E2"],
    "E_mp2": res["Energy"] + out["E2"],
    "nbf": bsets.primary.nbf, "naux": bsets.auxiliary.nbf,
}}))
"""


def main():
    systems = [int(a) for a in sys.argv[1:]] or [2, 1, 8]
    path = os.path.join(REPO, "MP2_RESULTS.json")
    results = {}
    if os.path.exists(path):
        with open(path) as f:
            results = json.load(f)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    for imol in systems:
        if str(imol) in results and "E_mp2" in results[str(imol)]:
            continue
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", _CODE.format(ref=REF, imol=imol)],
            env=env, capture_output=True, text=True, timeout=14400)
        out = {"error": proc.stderr[-600:]}
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT:"):
                out = json.loads(line[len("RESULT:"):])
        out["wall_s"] = round(time.time() - t0, 1)
        results[str(imol)] = out
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"S{imol:02d} {out}", flush=True)


if __name__ == "__main__":
    main()
