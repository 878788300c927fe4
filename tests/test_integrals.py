"""Integral engine tests: Boys function, OEI, ERI.

Oracles: scipy incomplete gamma (Boys), Szabo-Ostlund H2/STO-3G tables
(overlap/kinetic/ERI values at R=1.4 a0), exact H-atom one-electron
eigenvalues, and internal symmetry/normalization invariants.
"""

import numpy as np
import pytest
import scipy.linalg as sla

from juliachem_jl_tpu import basis, molecule
from juliachem_jl_tpu.ops.boys import boys
from juliachem_jl_tpu.ops.oei import overlap_kinetic_nuclear, dipole_matrices
from juliachem_jl_tpu.ops.eri import full_eri_tensor


def test_boys_vs_scipy():
    import jax.numpy as jnp
    from scipy.special import gamma, gammainc

    T = np.array([0.0, 1e-12, 0.1, 1.0, 5.0, 20.0, 34.9, 35.1, 50.0, 200.0, 1000.0])
    mmax = 16
    F = np.asarray(boys(jnp.asarray(T), mmax))

    def ref(m, t):
        if t < 1e-13:
            return 1.0 / (2 * m + 1)
        return 0.5 * gamma(m + 0.5) * gammainc(m + 0.5, t) / t ** (m + 0.5)

    for i, t in enumerate(T):
        for m in range(mmax + 1):
            r = ref(m, t)
            assert abs(F[i, m] - r) <= 1e-12 * abs(r), (t, m)


def _h_atom(bname):
    mol = molecule.from_input_dict(
        {"symbols": ["H"], "geometry": [0, 0, 0], "molecular_charge": 0})
    b = basis.build(mol, bname)
    S, T, V = overlap_kinetic_nuclear(b, mol)
    return sla.eigh(T + V, S, eigvals_only=True)[0]


def test_h_atom_sto3g():
    # golden: RHF/STO-3G hydrogen atom energy (one-electron exact)
    assert abs(_h_atom("STO-3G") - (-0.466581850)) < 1e-8


def test_h_atom_6311g():
    assert abs(_h_atom("6-311G") - (-0.499809810)) < 1e-6


def _h2(R_bohr=1.4):
    R = R_bohr * 0.52917724924
    mol = molecule.from_input_dict({"symbols": ["H", "H"], "geometry": [0, 0, 0, 0, 0, R]})
    return mol, basis.build(mol, "STO-3G")


def test_szabo_ostlund_h2():
    mol, b = _h2()
    S, T, V = overlap_kinetic_nuclear(b, mol)
    G = full_eri_tensor(b)
    assert abs(S[0, 1] - 0.6593) < 2e-4
    assert abs(T[0, 0] - 0.7600) < 2e-4
    assert abs(G[0, 0, 0, 0] - 0.7746) < 2e-4
    assert abs(G[0, 0, 1, 1] - 0.5697) < 2e-4
    assert abs(G[0, 1, 0, 1] - 0.2970) < 2e-4


def test_eri_8fold_symmetry_with_dpf():
    # one heavy atom with d/f functions: symmetry must hold through high am
    mol = molecule.from_input_dict(
        {"symbols": ["O", "H"], "geometry": [0, 0, 0.1, 0, 0.75, -0.47],
         "molecular_charge": -1})
    b = basis.build(mol, "6-31G(2df,p)")
    G = full_eri_tensor(b)
    for perm in [(1, 0, 2, 3), (0, 1, 3, 2), (2, 3, 0, 1)]:
        assert np.abs(G - G.transpose(perm)).max() < 1e-11


def test_overlap_normalized_all_classes():
    mol = molecule.from_input_dict(
        {"symbols": ["O", "H", "H"],
         "geometry": [0, 0, 0.116321, 0, 0.751155, -0.465285, 0, -0.751155, -0.465285]})
    for name in ["6-31G(2df,p)", "cc-pVDZ"]:
        b = basis.build(mol, name)
        S, T, V = overlap_kinetic_nuclear(b, mol)
        assert np.abs(np.diag(S) - 1.0).max() < 1e-12
        assert np.abs(S - S.T).max() < 1e-12
        # kinetic energy operator is positive definite
        assert sla.eigh(T, eigvals_only=True)[0] > 0


def test_dipole_matrices_symmetric():
    mol = molecule.from_input_dict(
        {"symbols": ["O", "H", "H"],
         "geometry": [0, 0, 0.116321, 0, 0.751155, -0.465285, 0, -0.751155, -0.465285]})
    b = basis.build(mol, "6-31G")
    mx, my, mz = dipole_matrices(b)
    for m in (mx, my, mz):
        assert np.abs(m - m.T).max() < 1e-12
