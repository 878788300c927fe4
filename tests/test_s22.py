"""S22 golden-energy suite vs GAMESS (reference test/runtests.jl).

Golden values from /root/reference/test/s22_gamess_values.json; inputs are
the reference's own example_inputs/S22/NN_MP2.json files (RHF/6-31G(2df,p)).
The full sweep is expensive on the CPU test runner, so by default only the
water dimer (S2) runs; set JCHEM_SLOW=1 for more systems.

Pass criterion matches the reference: Julia isapprox default
(rtol = sqrt(eps) ~ 1.49e-8 relative) — test/runtests.jl:62.

Each system runs in a fresh subprocess (see tests/_subproc.py for why).
"""

import json
import os

import numpy as np
import pytest

from tests._subproc import run_python_json

REF = "/root/reference"
SLOW = os.environ.get("JCHEM_SLOW") == "1"

with open(f"{REF}/test/s22_gamess_values.json") as f:
    GOLDEN = json.load(f)

SYSTEMS = [1, 2] if not SLOW else list(range(1, 23))

_CODE = """
import json
from juliachem_jl_tpu import basis, io, molecule
from juliachem_jl_tpu.models import properties, rhf

spec = io.read_input("{ref}/example_inputs/S22/{imol:02d}_MP2.json")
mol = molecule.from_input_dict(spec.molecule)
bsets = basis.run(mol, spec.model)
res = rhf.energy(mol, bsets, {{"niter": 60, "dele": 1e-9, "rmsd": 1e-7,
                               "guess": "sad"}})
props = properties.run(
    mol, bsets, res,
    {{"mo energies": True, "mulliken": True, "multipole": "dipole"}})
print("RESULT:" + json.dumps({{
    "energy": res["Energy"],
    "converged": bool(res["Converged?"]),
    "homo_lumo": props["MO Energies"]["homo_lumo"],
    "dipole": props["Dipole"]["moment"],
    "mulliken": list(props["Mulliken Population"]),
}}))
"""


_DF_CODE = """
import json
from juliachem_jl_tpu import basis, io, molecule
from juliachem_jl_tpu.basis import CalculationBasisSets
from juliachem_jl_tpu.models import rhf

spec = io.read_input("{ref}/example_inputs/S22/{imol:02d}_MP2.json")
mol = molecule.from_input_dict(spec.molecule)
import warnings
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    bsets = CalculationBasisSets(
        basis.build(mol, spec.model["basis"]),
        basis.build_auxiliary(mol, "cc-pVTZ-JKFIT", spec.model["basis"]),
    )
res = rhf.energy(mol, bsets, {{"scf_type": "df", "niter": 60, "dele": 1e-9,
                               "rmsd": 1e-7, "guess": "sad"}})
print("RESULT:" + json.dumps({{
    "energy": res["Energy"], "converged": bool(res["Converged?"]),
}}))
"""


@pytest.mark.parametrize("imol", SYSTEMS)
def test_s22_rhf_energy_vs_gamess(imol):
    out = run_python_json(_CODE.format(ref=REF, imol=imol))
    assert out["converged"]
    g = GOLDEN[str(imol)]
    e_gold = g["Energy"]
    assert abs(out["energy"] - e_gold) <= 1.49e-8 * abs(e_gold), (
        f"S{imol}: {out['energy']} vs golden {e_gold}"
    )
    # properties vs GAMESS (same tolerances as runtests.jl:68-91)
    assert abs(out["homo_lumo"] - g["HOMO-LUMO Gap"]) < 5e-4
    if g["Dipole"] == 1.0e-6:
        assert abs(out["dipole"]) <= 1.0e-6
    else:
        assert abs(out["dipole"] - g["Dipole"]) < 5e-5
    assert np.abs(np.asarray(out["mulliken"])
                  - np.asarray(g["Mulliken Population"])).max() < 5e-6


@pytest.mark.parametrize("imol", SYSTEMS if SLOW else [2])
def test_s22_df_vs_gamess(imol):
    """DF-RHF (cc-pVTZ-JKFIT) within 1.5e-3 Eh of the GAMESS conventional
    energy (reference test/runtests.jl:63)."""
    out = run_python_json(_DF_CODE.format(ref=REF, imol=imol))
    assert out["converged"]
    assert abs(out["energy"] - GOLDEN[str(imol)]["Energy"]) <= 1.5e-3
