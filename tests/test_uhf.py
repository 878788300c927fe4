"""UHF driver tests (capability EXCEEDING the reference, which is RHF-only —
src/rhf/energy/SCF.jl:69 rhf_kernel has no spin-polarized branch).

Validation strategy (no external UHF goldens exist in this environment):
  * closed-shell UHF must equal RHF exactly (same fixed point),
  * a one-electron system must equal the lowest core-Hamiltonian
    eigenvalue exactly (H atom: no two-electron terms survive),
  * DF-UHF must agree with conventional UHF to DF accuracy,
  * spin diagnostics: S^2 = 0 (singlet), 0.75 + small contamination
    (doublet), and symmetry breaking must lower stretched-H2 below RHF.
"""

import numpy as np
import pytest

from juliachem_jl_tpu import basis, molecule
from juliachem_jl_tpu.models import rhf, uhf


def _water():
    mol = molecule.from_input_dict({
        "symbols": ["O", "H", "H"],
        "geometry": [0, 0, 0, 0.757, 0.586, 0, -0.757, 0.586, 0],
    })
    return mol, basis.run(mol, {"basis": "6-31G"})


TIGHT = {"niter": 60, "dele": 1e-10, "rmsd": 1e-8, "guess": "sad"}


def test_uhf_singlet_matches_rhf_dense():
    mol, bsets = _water()
    flags = dict(TIGHT, contraction_mode="dense")
    r = rhf.energy(mol, bsets, flags)
    u = uhf.energy(mol, bsets, flags)
    assert u["Converged?"]
    assert abs(u["Energy"] - r["Energy"]) < 1e-11
    assert abs(u["S2"]) < 1e-10
    assert u["N Alpha"] == u["N Beta"] == 5


def test_uhf_singlet_matches_rhf_screened_direct():
    mol, bsets = _water()
    flags = dict(TIGHT, contraction_mode="screened")
    r = rhf.energy(mol, bsets, flags)
    u = uhf.energy(mol, bsets, flags)
    assert abs(u["Energy"] - r["Energy"]) < 1e-11


def test_uhf_one_electron_exact():
    # H atom doublet: UHF energy == lowest generalized eigenvalue of the
    # core Hamiltonian (no J/K for one electron; K(D_a) cancels J exactly
    # for the single alpha electron)
    mol = molecule.from_input_dict({
        "symbols": ["H"], "geometry": [0, 0, 0],
        "molecular_multiplicity": 2,
    })
    bsets = basis.run(mol, {"basis": "6-31G"})
    u = uhf.energy(mol, bsets, {"niter": 30, "dele": 1e-10, "rmsd": 1e-8,
                                "guess": "hcore"})
    from juliachem_jl_tpu.ops.oei import overlap_kinetic_nuclear
    import scipy.linalg as sla

    S, T, V = overlap_kinetic_nuclear(bsets.primary, mol)
    e0 = sla.eigh(T + V, S)[0][0]
    assert abs(u["Energy"] - e0) < 1e-12
    assert abs(u["S2"] - 0.75) < 1e-12
    assert u["N Alpha"] == 1 and u["N Beta"] == 0


def test_uhf_oh_radical_df_parity():
    mol = molecule.from_input_dict({
        "symbols": ["O", "H"], "geometry": [0, 0, 0, 0, 0, 0.97],
        "molecular_multiplicity": 2,
    })
    bsets = basis.run(mol, {"basis": "6-31G"})
    u1 = uhf.energy(mol, bsets, {"niter": 60, "dele": 1e-9, "rmsd": 1e-7,
                                 "guess": "sad"})
    assert u1["Converged?"]
    # doublet: S^2 slightly above 0.75 (spin contamination), never below
    assert 0.75 - 1e-9 < u1["S2"] < 0.80

    import warnings

    from juliachem_jl_tpu.basis import CalculationBasisSets

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        bdf = CalculationBasisSets(
            bsets.primary,
            basis.build_auxiliary(mol, "cc-pVTZ-JKFIT", "6-31G"))
    u2 = uhf.energy(mol, bdf, {"scf_type": "df", "niter": 60, "dele": 1e-9,
                               "rmsd": 1e-7, "guess": "sad"})
    assert u2["Converged?"]
    assert abs(u2["Energy"] - u1["Energy"]) < 1.5e-3


def test_uhf_symmetry_breaking_stretched_h2():
    # at 2.5 Angstrom the spin-symmetry-broken UHF solution lies well below
    # RHF (which dissociates incorrectly); guess_mix rotates the alpha
    # HOMO/LUMO to seed the broken-symmetry solution
    mol = molecule.from_input_dict({
        "symbols": ["H", "H"], "geometry": [0, 0, 0, 0, 0, 2.5],
    })
    bsets = basis.run(mol, {"basis": "6-31G"})
    r = rhf.energy(mol, bsets, dict(TIGHT, contraction_mode="dense"))
    u = uhf.energy(mol, bsets, dict(TIGHT, contraction_mode="dense",
                                    guess="hcore", guess_mix=0.7))
    assert u["Converged?"]
    assert u["Energy"] < r["Energy"] - 0.01
    # broken-symmetry singlet: S^2 between 0 and 1 but clearly nonzero
    assert u["S2"] > 0.3


def test_uhf_impossible_multiplicity():
    mol, bsets = _water()
    with pytest.raises(ValueError):
        uhf.energy(mol, bsets, {"multiplicity": 2})


def test_ump2_closed_shell_equals_rmp2():
    # RI-UMP2 on a closed-shell UHF reference must reproduce RI-MP2 exactly
    import warnings

    from juliachem_jl_tpu.basis import CalculationBasisSets
    from juliachem_jl_tpu.models import mp2

    mol, b0 = _water()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        b = CalculationBasisSets(
            b0.primary, basis.build_auxiliary(mol, "cc-pVTZ-JKFIT", "6-31G"))
    flags = {"scf_type": "df", "niter": 60, "dele": 1e-10, "rmsd": 1e-8,
             "guess": "sad"}
    r = rhf.energy(mol, b, flags)
    u = uhf.energy(mol, b, flags)
    e_r = mp2.ri_mp2_energy(r, b)["E2"]
    m_u = mp2.ri_ump2_energy(u, b)
    assert abs(m_u["E2"] - e_r) < 1e-12
    assert m_u["E2 Same Spin"] < 0 and m_u["E2 Opposite Spin"] < 0


def test_ump2_radical():
    import warnings

    from juliachem_jl_tpu.basis import CalculationBasisSets
    from juliachem_jl_tpu.models import mp2

    mol = molecule.from_input_dict({
        "symbols": ["O", "H"], "geometry": [0, 0, 0, 0, 0, 0.97],
        "molecular_multiplicity": 2,
    })
    b0 = basis.run(mol, {"basis": "6-31G"})
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        b = CalculationBasisSets(
            b0.primary, basis.build_auxiliary(mol, "cc-pVTZ-JKFIT", "6-31G"))
    u = uhf.energy(mol, b, {"scf_type": "df", "niter": 60, "dele": 1e-9,
                            "rmsd": 1e-7, "guess": "sad"})
    m = mp2.ri_ump2_energy(u, b)
    # correlation is negative, dominated by the opposite-spin channel
    assert -0.5 < m["E2"] < -0.01
    assert m["E2 Opposite Spin"] < m["E2 Same Spin"] < 0


def test_uhf_driver_route():
    # model.method == "UHF" routes through the end-to-end driver
    from juliachem_jl_tpu.io.input_parser import InputSpec

    spec = InputSpec(
        driver="energy",
        model={"method": "UHF", "basis": "6-31G"},
        molecule={"symbols": ["H"], "geometry": [0, 0, 0],
                  "molecular_multiplicity": 2},
        keywords={"scf": {"guess": "hcore", "niter": 30,
                          "dele": 1e-9, "rmsd": 1e-7}},
    )
    from juliachem_jl_tpu import driver

    out = driver.run_spec(spec)
    assert out["Energy"]["Converged?"]
    assert abs(out["Energy"]["S2"] - 0.75) < 1e-10
