"""Fluorine basis-data validation (hydrogen fluoride molecule).

No fluorine-containing golden exists in this environment: the S22 corpus has
no F, and the reference snapshot ships no bsed.h5/eatom data beyond hydrogen
(records/eatom.h5 holds only RHF/H/*).  The F 6-31G tables therefore stay
flagged ``unverified_vs_goldens`` in the library __meta__, and this test
pins what CAN be checked without an external value:

* SCF on HF/6-31G converges to a stable closed-shell solution in the
  expected energy window (the published RHF/6-31G energy is approximately
  -99.98 Eh; a transcription error in an exponent or contraction coefficient
  moves the energy at the 1e-2..1 Eh scale, far outside the window).
* The virial ratio -V/T is within 6e-3 of 2 at the experimental geometry
  (r = 0.917 A; molecule geometry inputs are in angstrom,
  matching the reference input convention): corrupted primitive data breaks the kinetic/potential
  balance long before it shows in convergence behavior.
* DF-RHF with the even-tempered AutoAux fallback (cc-pVTZ-JKFIT has no F
  entry) reproduces the conventional energy within the reference's DF
  parity tolerance (1.5e-3 Eh, test/runtests.jl:63).
"""

import numpy as np
import pytest

from juliachem_jl_tpu import basis, molecule
from juliachem_jl_tpu.models import rhf

@pytest.fixture(scope="module")
def hf_mol():
    return molecule.from_input_dict({
        "symbols": ["F", "H"],
        "geometry": [0.0, 0.0, 0.0,
                     0.0, 0.0, 0.917],
        "molecular_charge": 0,
    })


@pytest.fixture(scope="module")
def conv_result(hf_mol):
    bsets = basis.run(hf_mol, {"method": "RHF", "basis": "6-31G"})
    res = rhf.energy(hf_mol, bsets, {"niter": 50, "dele": 1e-10,
                                     "rmsd": 1e-8, "guess": "sad"})
    return bsets, res

def test_hf_631g_energy_window(conv_result):
    _, res = conv_result
    assert res["Converged?"]
    assert -100.06 < res["Energy"] < -99.90


def test_hf_631g_virial_ratio(conv_result, hf_mol):
    from juliachem_jl_tpu.ops import oei

    bsets, res = conv_result
    b = bsets.primary
    D = np.asarray(res["Density"])
    S, T, V = (np.asarray(m)
               for m in oei.overlap_kinetic_nuclear(b, hf_mol))
    # E = T_e + (V_en + V_ee + V_nn); T_e = tr(D T).  V_total = E - T_e.
    t_e = float(np.sum(D * T))
    v_tot = res["Energy"] - t_e
    ratio = -v_tot / t_e
    assert abs(ratio - 2.0) < 6e-3, ratio


def test_hf_631g_df_matches_conventional(conv_result):
    import warnings

    from juliachem_jl_tpu.basis import CalculationBasisSets

    hf_bsets, res = conv_result
    mol = molecule.from_input_dict({
        "symbols": ["F", "H"],
        "geometry": [0.0, 0.0, 0.0,
                     0.0, 0.0, 0.917],
        "molecular_charge": 0,
    })
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        bsets = CalculationBasisSets(
            hf_bsets.primary,
            basis.build_auxiliary(mol, "cc-pVTZ-JKFIT", "6-31G"),
        )
    df = rhf.energy(mol, bsets, {"scf_type": "df", "niter": 50,
                                 "dele": 1e-10, "rmsd": 1e-8, "guess": "sad"})
    assert df["Converged?"]
    assert abs(df["Energy"] - res["Energy"]) < 1.5e-3
