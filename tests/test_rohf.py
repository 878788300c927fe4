"""ROHF driver tests (beyond the RHF-only reference).

Physics-based validation (no external ROHF goldens here):
  * closed-shell ROHF collapses to RHF exactly (empty open shell makes the
    Guest-Saunders effective Fock the RHF Fock),
  * variational ordering E_UHF <= E_ROHF for the same radical, with the
    gap small (spin-contamination energy),
  * <S^2> is exactly s(s+1) by construction,
  * DF-ROHF agrees with conventional ROHF to DF accuracy.
"""

import numpy as np

from juliachem_jl_tpu import basis, molecule
from juliachem_jl_tpu.models import rhf, rohf, uhf

TIGHT = {"niter": 80, "dele": 1e-10, "rmsd": 1e-8}


def test_rohf_closed_shell_matches_rhf():
    mol = molecule.from_input_dict({
        "symbols": ["O", "H", "H"],
        "geometry": [0, 0, 0, 0.757, 0.586, 0, -0.757, 0.586, 0],
    })
    b = basis.run(mol, {"basis": "6-31G"})
    flags = dict(TIGHT, contraction_mode="dense")
    r = rhf.energy(mol, b, dict(flags, guess="sad"))
    ro = rohf.energy(mol, b, flags)
    assert ro["Converged?"]
    assert abs(ro["Energy"] - r["Energy"]) < 1e-10
    assert ro["S2"] == 0.0


def test_rohf_oh_radical_above_uhf():
    mol = molecule.from_input_dict({
        "symbols": ["O", "H"], "geometry": [0, 0, 0, 0, 0, 0.97],
        "molecular_multiplicity": 2,
    })
    b = basis.run(mol, {"basis": "6-31G"})
    u = uhf.energy(mol, b, dict(TIGHT, guess="sad"))
    ro = rohf.energy(mol, b, TIGHT)
    assert ro["Converged?"] and u["Converged?"]
    gap = ro["Energy"] - u["Energy"]
    assert 0.0 <= gap < 0.01          # variational; small contamination gap
    assert ro["S2"] == 0.75           # exact by construction


def test_rohf_df_parity():
    import warnings

    from juliachem_jl_tpu.basis import CalculationBasisSets

    mol = molecule.from_input_dict({
        "symbols": ["O", "H"], "geometry": [0, 0, 0, 0, 0, 0.97],
        "molecular_multiplicity": 2,
    })
    b = basis.run(mol, {"basis": "6-31G"})
    ro = rohf.energy(mol, b, TIGHT)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        bdf = CalculationBasisSets(
            b.primary, basis.build_auxiliary(mol, "cc-pVTZ-JKFIT", "6-31G"))
    rodf = rohf.energy(mol, bdf, dict(TIGHT, scf_type="df"))
    assert rodf["Converged?"]
    assert abs(rodf["Energy"] - ro["Energy"]) < 1.5e-3
