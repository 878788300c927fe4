"""Property tests: Mulliken sum rule, dipole physical checks, formation
energy vs the shipped eatom table, MO energies."""

import numpy as np

from juliachem_jl_tpu import basis, molecule
from juliachem_jl_tpu.basis import CalculationBasisSets
from juliachem_jl_tpu.models import properties, rhf

WATER = {
    "symbols": ["O", "H", "H"],
    "geometry": [0.0, 0.0, 0.116321, 0.0, 0.751155, -0.465285, 0.0, -0.751155, -0.465285],
}


def _run(mol, bname):
    b = CalculationBasisSets(basis.build(mol, bname))
    res = rhf.energy(mol, b, {"niter": 60, "dele": 1e-9, "rmsd": 1e-7})
    return b, res


def test_mulliken_sums_to_electron_count():
    mol = molecule.from_input_dict(WATER)
    b, res = _run(mol, "6-31G")
    pops = properties.mulliken_populations(mol, b.primary, res)
    assert abs(pops.sum() - mol.nelectrons) < 1e-10
    # O should carry more electrons than neutral share in water
    assert pops[0] > 8.0


def test_water_dipole_direction_and_magnitude():
    mol = molecule.from_input_dict(WATER)
    b, res = _run(mol, "6-31G")
    dip = properties.dipole_moment(mol, b.primary, res)
    # water RHF/6-31G dipole ~ 2.6-2.7 D along the C2 axis
    assert 2.0 < dip["moment"] < 3.2
    assert abs(dip["total"][0]) < 1e-6  # x is perpendicular to the plane here


def test_homo_lumo():
    mol = molecule.from_input_dict(WATER)
    b, res = _run(mol, "6-31G")
    out = properties.mo_energies(res)
    assert out["homo"] < 0 < out["lumo"]


def test_formation_energy_h2_vs_eatom_table():
    # E_formation(H2) = E(H2) - 2 E_atom(H); E_atom(H) from the shipped
    # eatom table (extracted from the reference records/eatom.h5)
    R = 1.4 * 0.52917724924
    mol = molecule.from_input_dict({"symbols": ["H", "H"], "geometry": [0, 0, 0, 0, 0, R]})
    b, res = _run(mol, "STO-3G")
    ef = properties.formation_energy(mol, b.primary, res)
    expected = res["Energy"] - 2 * (-0.4665818503784861)
    assert abs(ef - expected) < 1e-10
    assert ef < 0  # H2 is bound


def test_properties_run_keywords():
    mol = molecule.from_input_dict(WATER)
    b, res = _run(mol, "STO-3G")
    out = properties.run(mol, b, res, {"mo energies": True, "mulliken": True,
                                       "multipole": "dipole"})
    assert {"MO Energies", "Mulliken Population", "Dipole"} <= set(out)
