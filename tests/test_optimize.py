"""Geometry optimization tests (beyond the reference — it has no working
gradients, hence no optimizer)."""

import numpy as np

from juliachem_jl_tpu import molecule
from juliachem_jl_tpu.models import optimize
from juliachem_jl_tpu.utils.elements import ANGSTROM_TO_BOHR


def test_optimize_h2_rhf():
    # RHF/6-31G equilibrium bond length: 0.730 Angstrom
    mol = molecule.from_input_dict({
        "symbols": ["H", "H"], "geometry": [0, 0, 0, 0, 0, 0.9],
    })
    out = optimize.optimize(mol, {"basis": "6-31G"})
    assert out["Converged?"]
    r = np.linalg.norm(out["Molecule"].coords[1] - out["Molecule"].coords[0])
    assert abs(r / ANGSTROM_TO_BOHR - 0.730) < 2e-3
    assert abs(out["Energy"] - (-1.126828)) < 1e-5
    # monotone-ish: final energy below the starting point's
    assert out["Energy"] < out["Trajectory"][0][0]


def test_optimize_oh_uhf():
    # UHF doublet OH radical relaxes to a physical bond length
    mol = molecule.from_input_dict({
        "symbols": ["O", "H"], "geometry": [0, 0, 0, 0, 0, 1.10],
        "molecular_multiplicity": 2,
    })
    out = optimize.optimize(mol, {"basis": "6-31G"}, method="UHF",
                            gtol=1e-4)
    assert out["Converged?"]
    r = np.linalg.norm(out["Molecule"].coords[1] - out["Molecule"].coords[0])
    assert 0.90 < r / ANGSTROM_TO_BOHR < 1.02
    assert np.abs(out["Gradient"]).max() < 1e-4


def test_frequencies_h2():
    """Numerical Hessian of the analytic gradient: H2 RHF/6-31G harmonic
    frequency (literature ~4645 cm^-1) after optimization; translations
    and rotations near zero."""
    from juliachem_jl_tpu.models import hessian

    mol = molecule.from_input_dict({
        "symbols": ["H", "H"], "geometry": [0, 0, 0, 0, 0, 0.73],
    })
    opt = optimize.optimize(mol, {"basis": "6-31G"})
    out = hessian.frequencies(opt["Molecule"], {"basis": "6-31G"})
    assert out["Frequencies"].shape == (1,)
    assert 4550.0 < out["Frequencies"][0] < 4750.0
    # 3 translations + 2 rotations, all tiny at the optimized geometry
    rest = np.sort(np.abs(out["All Frequencies"]))[:5]
    assert rest.max() < 60.0
