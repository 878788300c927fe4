"""Parse EVERY reference example input and build its basis sets.

Coverage proof for the input surface: each of the reference's committed
example_inputs/*.json (the full user-facing API of JuliaChem's JCInput +
JCBasis layers, src/input/JCInput.jl + src/basis/JCBasis.jl) must parse
with io.read_input, produce a molecule, and resolve every (element, basis,
aux-basis) against our basis library / AutoAux generator.  No SCF is run —
this is the setup layer only, so it is cheap enough to sweep all ~278
inputs on the host.

Writes INPUT_COVERAGE.json: {path: {"ok": bool, "natoms", "nbf", "naux"
or "error"}} plus a summary line.  Usage: python tools/check_input_coverage.py
"""

from __future__ import annotations

import json
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF = "/root/reference/example_inputs"


def check_one(jc, path: str) -> dict:
    spec = jc.io.read_input(path)
    mol = jc.molecule.run(spec)
    model = dict(spec.model)
    bsets = jc.basis.run(mol, model)
    rec = {
        "ok": True,
        "natoms": int(len(mol.symbols)),
        "basis": model.get("basis"),
        "nbf": int(bsets.primary.nbf),
    }
    if bsets.auxiliary is not None:
        rec["aux"] = model.get("auxiliary_basis")
        rec["naux"] = int(bsets.auxiliary.nbf)
    return rec


def main():
    import juliachem_jl_tpu as jc

    results = {}
    n_ok = 0
    paths = []
    for root, _dirs, files in os.walk(REF):
        for f in sorted(files):
            if f.endswith(".json"):
                paths.append(os.path.join(root, f))
    paths.sort()
    for p in paths:
        key = os.path.relpath(p, REF)
        try:
            results[key] = check_one(jc, p)
            n_ok += 1
        except Exception as e:  # noqa: BLE001 — record and continue
            results[key] = {"ok": False, "error": f"{type(e).__name__}: {e}",
                            "trace": traceback.format_exc().splitlines()[-3:]}
        print(("ok " if results[key]["ok"] else "FAIL ") + key, flush=True)
    out = {"summary": {"total": len(paths), "ok": n_ok,
                       "fail": len(paths) - n_ok},
           "inputs": results}
    with open(os.path.join(REPO, "INPUT_COVERAGE.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["summary"]))
    return 0 if n_ok == len(paths) else 1


if __name__ == "__main__":
    sys.exit(main())
