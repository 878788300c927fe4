"""OEI derivative kernels vs finite differences (reference parity:
deps/src/jeri-oei.hpp:67-199 derivative blocks + GradHelpers.jl assembly)."""

import numpy as np
import pytest

from juliachem_jl_tpu import basis as basis_mod
from juliachem_jl_tpu import molecule
from juliachem_jl_tpu.molecule import Molecule
from juliachem_jl_tpu.ops.oei import overlap_kinetic_nuclear
from juliachem_jl_tpu.ops.oei_grad import stv_gradients
from juliachem_jl_tpu.utils import elements

WATER = {
    "symbols": ["O", "H", "H"],
    "geometry": [0.0, 0.0, 0.116321, 0.0, 0.751155, -0.465285,
                 0.0, -0.751155, -0.465285],
}


def _mol_at(coords):
    syms = WATER["symbols"]
    z = np.array([elements.symbol_to_z(s) for s in syms], dtype=np.int64)
    return Molecule(z=z, symbols=list(syms), coords=np.asarray(coords), charge=0)


@pytest.fixture(scope="module")
def system():
    mol = molecule.from_input_dict(WATER)
    b = basis_mod.build(mol, "6-31G*")
    return mol, b


def test_translational_invariance(system):
    mol, b = system
    dS, dT, dV = stv_gradients(b, mol)
    assert np.abs(dS.sum(axis=0)).max() < 1e-10
    assert np.abs(dT.sum(axis=0)).max() < 1e-10
    assert np.abs(dV.sum(axis=0)).max() < 1e-9


def test_stv_gradients_vs_finite_differences(system):
    mol, b = system
    dS, dT, dV = stv_gradients(b, mol)
    h = 1e-5
    rng_atoms = [0, 1]  # O and one H (translation invariance covers the rest)
    for k in rng_atoms:
        for d in range(3):
            cp = mol.coords.copy()
            cp[k, d] += h
            mp = _mol_at(cp)
            bp = basis_mod.build(mp, "6-31G*")
            Sp, Tp, Vp = overlap_kinetic_nuclear(bp, mp)
            cm = mol.coords.copy()
            cm[k, d] -= h
            mm = _mol_at(cm)
            bm = basis_mod.build(mm, "6-31G*")
            Sm, Tm, Vm = overlap_kinetic_nuclear(bm, mm)
            for name, M, dM in (("S", (Sp - Sm), dS), ("T", (Tp - Tm), dT),
                                ("V", (Vp - Vm), dV)):
                fd = M / (2 * h)
                err = np.abs(fd - dM[k, d]).max()
                assert err < 1e-7, f"d{name}/d(atom{k},{'xyz'[d]}): err {err}"
