"""Fluorine basis-data validation (hydrogen fluoride molecule).

No fluorine-containing golden exists in the reference snapshot (the S22
corpus has no F and records/eatom.h5 holds only RHF/H/*), so the F tables
are validated against *published literature* values instead:

* RHF/STO-3G on HF at R = 1.7328 bohr: E = -98.5707 Eh, the classic
  Szabo & Ostlund worked example (Modern Quantum Chemistry, ch. 3).  Our
  value -98.57077532 matches every printed decimal.
* RHF/6-31G* on HF at its 6-31G* optimized bond length r = 0.911 A:
  E = -100.002907 Eh (NIST CCCBDB).  Our value -100.00290698.
* The STO-3G exponents obey the universal least-squares STO-nG expansion
  exactly (alpha_k = zeta^2 * a_k with the element-independent a_k of
  Hehre/Stewart/Pople 1969, zeta_1s(F) = 8.65, zeta_2sp(F) = 2.55), and
  the contraction coefficients are the element-independent universal fit —
  a mathematically independent derivation of the whole STO-3G F table.
* Every F shell in every bundled basis is self-normalized to <= 1e-7:
  a single mistyped digit in an exponent or coefficient of published
  (normalized) data breaks <phi|phi> = 1 at the 1e-4..1e-2 scale.
* The virial ratio -V/T is within 6e-3 of 2 at the experimental geometry
  (r = 0.917 A): corrupted primitive data breaks the kinetic/potential
  balance long before it shows in convergence behavior.
* DF-RHF with the even-tempered AutoAux fallback (cc-pVTZ-JKFIT has no F
  entry) reproduces the conventional energy within the reference's DF
  parity tolerance (1.5e-3 Eh, test/runtests.jl:63).
"""

import math

import numpy as np
import pytest

from juliachem_jl_tpu import basis, molecule
from juliachem_jl_tpu.basis import library
from juliachem_jl_tpu.models import rhf

_BOHR = 0.52917724924  # JCBasis.jl:61 conversion constant

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


def _hf_energy(basis_name: str, r_angstrom: float) -> float:
    mol = molecule.from_input_dict({
        "symbols": ["H", "F"],
        "geometry": [0.0, 0.0, 0.0, 0.0, 0.0, r_angstrom],
        "molecular_charge": 0,
    })
    bsets = basis.run(mol, {"method": "RHF", "basis": basis_name})
    res = rhf.energy(mol, bsets, {"niter": 50, "dele": 1e-10, "rmsd": 1e-8})
    assert res["Converged?"]
    return float(res["Energy"])


def test_hf_sto3g_szabo_ostlund_golden():
    """Szabo & Ostlund's STO-3G HF at R = 1.7328 bohr: E = -98.5707 Eh."""
    e = _hf_energy("STO-3G", 1.7328 * _BOHR)
    assert abs(e - (-98.5707)) < 1e-4, e


def test_hf_631gstar_cccbdb_golden():
    """NIST CCCBDB RHF/6-31G* HF at its optimized r = 0.911 A:
    E = -100.002907 Eh."""
    e = _hf_energy("6-31G*", 0.911)
    assert abs(e - (-100.002907)) < 5e-5, e


def test_sto3g_fluorine_universal_expansion():
    """STO-3G data is a zeta-scaled universal fit (Hehre/Stewart/Pople
    1969): alpha_k = zeta^2 * a_k, coefficients element-independent."""
    a_1s = [2.227660584, 0.405771156, 0.109818]
    a_2sp = [0.994203, 0.231031, 0.0751386]
    f_shells = library.lookup("F", "STO-3G")
    s_sh, l_sh = f_shells[0], f_shells[1]
    zeta1, zeta2 = 8.65, 2.55
    for k in range(3):
        assert abs(s_sh["exps"][k] / (zeta1**2 * a_1s[k]) - 1) < 1e-5
        assert abs(l_sh["exps"][k] / (zeta2**2 * a_2sp[k]) - 1) < 1e-5
    assert s_sh["coefs"] == [0.15432897, 0.53532814, 0.44463454]
    assert l_sh["coefs_s"] == [-0.09996723, 0.39951283, 0.70011547]
    assert l_sh["coefs_p"] == [0.15591627, 0.60768372, 0.39195739]


def _self_overlap(exps, coefs, l: int) -> float:
    """<phi|phi> for a contraction of unit-normalized primitives."""
    tot = 0.0
    for ai, ci in zip(exps, coefs):
        for aj, cj in zip(exps, coefs):
            tot += ci * cj * (2.0 * math.sqrt(ai * aj) / (ai + aj)) ** (l + 1.5)
    return tot


@pytest.mark.parametrize("basis_name",
                         ["STO-3G", "6-31G", "6-31G*", "6-31+G*"])
def test_fluorine_shells_normalized(basis_name):
    """Published basis data ships normalized contractions; a transcription
    typo in any digit breaks <phi|phi> = 1 far beyond 1e-7."""
    lmap = {"S": 0, "P": 1, "D": 2, "F": 3}
    for sh in library.lookup("F", basis_name):
        if sh["l"] == "L":
            assert abs(_self_overlap(sh["exps"], sh["coefs_s"], 0) - 1) < 1e-7
            assert abs(_self_overlap(sh["exps"], sh["coefs_p"], 1) - 1) < 1e-7
        else:
            l = lmap[sh["l"]]
            assert abs(_self_overlap(sh["exps"], sh["coefs"], l) - 1) < 1e-7


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
