"""Physics pins for the lithium tables (no Li golden exists in the
reference snapshot — the committed ARPA-E outputs cover only the Li-free
fig1e — so, like fluorine, the transcribed published values are validated
by energy windows + the virial theorem; see tools/make_basis_library.py).

Literature anchors: ROHF Li atom, HF limit -7.432727; with 6-31G the
published ROHF energy is -7.43124 (the 6-31G Li set recovers the HF limit
to ~1.5e-3).  A transcription error in any core exponent or contraction
coefficient moves the atomic energy by >>1e-2 and breaks the virial ratio.
"""

import numpy as np
import pytest

from juliachem_jl_tpu import basis, molecule
from juliachem_jl_tpu.basis import CalculationBasisSets
from juliachem_jl_tpu.models import rohf


@pytest.mark.parametrize("bname,window", [
    ("6-31G", (-7.4330, -7.4295)),
    ("6-311G", (-7.4330, -7.4310)),
])
def test_li_atom_rohf(bname, window):
    mol = molecule.from_input_dict(
        {"symbols": ["Li"], "geometry": [0.0, 0.0, 0.0],
         "molecular_charge": 0, "molecular_multiplicity": 2})
    bsets = CalculationBasisSets(basis.build(mol, bname), None)
    res = rohf.energy(mol, bsets, {"niter": 60, "dele": 1e-9, "rmsd": 1e-7,
                                   "guess": "hcore"})
    e = res["Energy"]
    assert res["Converged?"]
    assert window[0] < e < window[1], e
    # virial ratio -V/T = 2 for a converged atomic HF solution
    ratio = -res["Potential Energy"] / res["Kinetic Energy"] \
        if "Potential Energy" in res else None
    if ratio is not None:
        assert abs(ratio - 2.0) < 2e-3
