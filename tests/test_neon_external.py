"""Element coverage beyond the bundled exact-data set (H/C/N/O/F).

The reference's bsed.h5 keys every element H-Xe (BasisHelpers.jl:1-59); here
the escape hatch is the GAMESS-US basis-file import (basis/external.py).
This committed fixture exercises a real element outside the bundled five —
neon — through that path end-to-end:

* tests/data/ne_sto3g.gbs carries Ne STO-3G derived from the universal
  STO-3G least-squares expansion (alpha_k = zeta^2 * a_k, zeta_1s = 9.64,
  zeta_2sp = 2.88), the same derivation validated exactly against the
  bundled published fluorine table in test_fluorine.py.
* The Ne atom RHF energy reproduces the literature STO-3G value
  -126.60452 Eh, and the virial ratio is physical.
"""

import numpy as np
import pytest

from juliachem_jl_tpu import basis, molecule
from juliachem_jl_tpu.models import rhf


@pytest.fixture(scope="module")
def ne_result():
    basis.register_basis_file("tests/data/ne_sto3g.gbs", name="STO-3G")
    mol = molecule.from_input_dict(
        {"symbols": ["Ne"], "geometry": [0.0, 0.0, 0.0],
         "molecular_charge": 0})
    bsets = basis.run(mol, {"method": "RHF", "basis": "STO-3G"})
    res = rhf.energy(mol, bsets, {"niter": 50, "dele": 1e-10, "rmsd": 1e-8})
    return mol, bsets, res


def test_neon_sto3g_literature_energy(ne_result):
    _, _, res = ne_result
    assert res["Converged?"]
    assert abs(res["Energy"] - (-126.60452)) < 1e-4, res["Energy"]


def test_neon_virial_ratio(ne_result):
    from juliachem_jl_tpu.ops import oei

    mol, bsets, res = ne_result
    _, T, _ = (np.asarray(m)
               for m in oei.overlap_kinetic_nuclear(bsets.primary, mol))
    t_e = float(np.sum(np.asarray(res["Density"]) * T))
    ratio = -(res["Energy"] - t_e) / t_e
    # STO-3G zeta values are energy-optimized per atom only approximately;
    # ~1e-2 virial deviation is the expected scale for a minimal basis
    assert abs(ratio - 2.0) < 2e-2, ratio
