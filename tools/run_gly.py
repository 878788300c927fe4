"""Glycine-chain family (reference example_inputs/gly/df/glyN.json):
conventional RHF vs DF-RHF self-parity.

The reference ships 18 glycine-chain inputs (cc-pVDZ, cc-pVDZ-RIFIT aux)
but commits no golden outputs for them, so the gate is the CI's own
DF-vs-conventional criterion: |E_df - E_conv| <= 1.5e-3 Eh
(/root/reference/test/runtests.jl:63).  The RIFIT aux resolves through the
AutoAux generator (basis/library.py) since no transcribable RIFIT table
exists in this environment (tools/make_basis_library.py provenance notes).

Resumable: records land in GLY_RESULTS.json per system+mode; existing
passes are skipped.  Usage:
  python tools/run_gly.py [N ...]       # default: 1 2 3
"""

from __future__ import annotations

import json
import os
import sys
import time
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RESULTS = os.path.join(REPO, "GLY_RESULTS.json")
INPUT = "/root/reference/example_inputs/gly/df/gly{n}.json"
KW = {"niter": 60, "dele": 1e-9, "rmsd": 1e-7, "guess": "sad"}
DF_GATE = 1.5e-3


def _load() -> dict:
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            return json.load(f)
    return {}


def _save(data: dict) -> None:
    with open(RESULTS, "w") as f:
        json.dump(data, f, indent=1)


def run_system(n: int, data: dict) -> None:
    from juliachem_jl_tpu import basis, io, molecule
    from juliachem_jl_tpu.basis import CalculationBasisSets
    from juliachem_jl_tpu.models import rhf

    key = f"gly{n}"
    rec = data.setdefault(key, {})
    spec = io.read_input(INPUT.format(n=n))
    mol = molecule.from_input_dict(spec.molecule)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        bsets_conv = CalculationBasisSets(
            basis.build(mol, spec.model["basis"]), None)
        aux = basis.build_auxiliary(
            mol, spec.model["auxiliary_basis"], spec.model["basis"])
        bsets_df = CalculationBasisSets(bsets_conv.primary, aux)
    print(f"# {key}: nbf={bsets_conv.primary.nbf} naux={aux.nbf}",
          flush=True)

    for mode, bsets in (("conv", bsets_conv), ("df", bsets_df)):
        if rec.get(mode, {}).get("converged"):
            continue
        kw = dict(KW)
        kw["scf_type"] = "rhf" if mode == "conv" else "df"
        t0 = time.time()
        res = rhf.energy(mol, bsets, kw)
        rec[mode] = {
            "energy": res["Energy"],
            "converged": bool(res["Converged?"]),
            "iters": res["Iterations"],
            "wall_s": round(time.time() - t0, 1),
            "ts": round(time.time(), 1),
        }
        _save(data)
        print(f"{key} {mode} E={res['Energy']:.10f} "
              f"({rec[mode]['wall_s']}s, {res['Iterations']} iters)",
              flush=True)

    if rec.get("conv", {}).get("converged") and rec.get("df", {}).get(
            "converged"):
        de = abs(rec["df"]["energy"] - rec["conv"]["energy"])
        rec["df_parity_eh"] = de
        rec["pass"] = bool(de <= DF_GATE)
        _save(data)
        print(f"{key} parity {de:.2e} Eh -> "
              f"{'PASS' if rec['pass'] else 'FAIL'}", flush=True)


def main() -> int:
    ns = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 2, 3]
    data = _load()
    for n in ns:
        try:
            run_system(n, data)
        except Exception as e:  # noqa: BLE001 — record and continue
            data.setdefault(f"gly{n}", {})["error"] = (
                f"{type(e).__name__}: {e}")
            _save(data)
            print(f"gly{n} ERROR {e}", flush=True)
    npass = sum(1 for v in data.values() if v.get("pass"))
    print(json.dumps({"systems": len(data), "pass": npass}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
