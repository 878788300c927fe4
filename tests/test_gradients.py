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


# ---------------------------------------------------------------------------
# Two-electron (4-center ERI) derivatives — EXCEEDS the reference, which
# disables gradients outright (Gradient.jl:31-32).
# ---------------------------------------------------------------------------

def test_eri_gradient_translational_invariance(system):
    from juliachem_jl_tpu.ops.eri_grad import two_electron_gradient

    mol, b = system
    rng = np.random.default_rng(3)
    X = rng.standard_normal((b.nbf, b.nbf))
    D = X + X.T
    g = two_electron_gradient(b, mol, D)
    assert np.abs(g.sum(axis=0)).max() < 1e-9


def test_eri_gradient_vs_finite_differences():
    """d E_2e[D fixed] / dR against central differences of the contracted
    full ERI tensor (STO-3G water: S and P classes in play).  NOTE:
    displacements act on Molecule.coords directly — from_input_dict recenters
    to the center of mass, which would halve an input-frame step."""
    from juliachem_jl_tpu.ops.eri import full_eri_tensor
    from juliachem_jl_tpu.ops.eri_grad import two_electron_gradient

    mol = molecule.from_input_dict(WATER)
    b = basis_mod.build(mol, "STO-3G")
    rng = np.random.default_rng(0)
    X = rng.standard_normal((b.nbf, b.nbf))
    D = X + X.T

    def e2(coords):
        m = _mol_at(coords)
        bb = basis_mod.build(m, "STO-3G")
        eri = full_eri_tensor(bb)
        J = np.einsum("mnls,ls->mn", eri, D)
        K = np.einsum("mlns,ls->mn", eri, D)
        return 0.5 * np.sum(D * J) - 0.25 * np.sum(D * K)

    g = two_electron_gradient(b, mol, D, cutoff=0.0)
    h = 1e-5
    for k in (0, 1):          # O and one H; invariance covers the third atom
        for d in range(3):
            cp = mol.coords.copy(); cp[k, d] += h
            cm = mol.coords.copy(); cm[k, d] -= h
            fd = (e2(cp) - e2(cm)) / (2 * h)
            assert abs(g[k, d] - fd) < 1e-7, (k, d, g[k, d], fd)


def test_total_rhf_gradient_vs_finite_differences():
    """Full analytic RHF gradient vs central differences of the CONVERGED
    SCF energy (water/STO-3G, tight convergence)."""
    from juliachem_jl_tpu.models import rhf
    from juliachem_jl_tpu.models.gradient import total_gradient

    flags = {"niter": 60, "dele": 1e-11, "rmsd": 1e-9, "guess": "hcore"}

    def scf_energy(m):
        bb = basis_mod.build(m, "STO-3G")
        from juliachem_jl_tpu.basis import CalculationBasisSets
        res = rhf.energy(m, CalculationBasisSets(bb, None), flags)
        assert res["Converged?"]
        return res

    mol = molecule.from_input_dict(WATER)
    res = scf_energy(mol)
    b = basis_mod.build(mol, "STO-3G")
    g = total_gradient(mol, b, np.asarray(res["Density"]),
                       np.asarray(res["W"]))
    # translational invariance of the full gradient
    assert np.abs(g.sum(axis=0)).max() < 1e-8

    h = 2e-4
    for (k, d) in ((0, 2), (1, 1)):   # spot-check two stiff components
        cp = mol.coords.copy(); cp[k, d] += h
        cm = mol.coords.copy(); cm[k, d] -= h
        fd = (scf_energy(_mol_at(cp))["Energy"]
              - scf_energy(_mol_at(cm))["Energy"]) / (2 * h)
        assert abs(g[k, d] - fd) < 5e-6, (k, d, g[k, d], fd)


def test_df_gradient_vs_finite_differences():
    """RI-fitted two-electron gradient (3-center + metric derivative terms)
    against central differences of the fitted E_2e at fixed density."""
    import warnings

    from juliachem_jl_tpu.ops.eri3c import two_center_metric
    from juliachem_jl_tpu.ops.eri_grad import (_dense_three_center,
                                               df_two_electron_gradient)

    mol = molecule.from_input_dict(WATER)
    prim = basis_mod.build(mol, "STO-3G")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        aux = basis_mod.build_auxiliary(mol, "cc-pVDZ-JKFIT", "STO-3G")
    rng = np.random.default_rng(1)
    X = rng.standard_normal((prim.nbf, prim.nbf))
    D = X + X.T

    def e2(coords):
        m = _mol_at(coords)
        p = basis_mod.build(m, "STO-3G")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            a = basis_mod.build_auxiliary(m, "cc-pVDZ-JKFIT", "STO-3G")
        P3 = _dense_three_center(p, a)
        M = two_center_metric(a)
        P3f = P3.reshape(a.nbf, -1)
        v = P3f @ D.reshape(-1)
        U = (0.5 * v[:, None, None] * D[None]
             - 0.25 * np.einsum("pr,ars,sq->apq", D, P3, D))
        gam = np.linalg.solve(M, U.reshape(a.nbf, -1))
        return float(np.sum(gam * P3f))

    # Cartesian-space fit: oracle and analytic gradient share the space
    g = df_two_electron_gradient(prim, aux, mol, D, sph_aux=False)
    assert np.abs(g.sum(axis=0)).max() < 1e-10   # translational invariance
    h = 1e-5
    for (k, d) in ((0, 2), (1, 1)):
        cp = mol.coords.copy(); cp[k, d] += h
        cm = mol.coords.copy(); cm[k, d] -= h
        fd = (e2(cp) - e2(cm)) / (2 * h)
        assert abs(g[k, d] - fd) < 1e-7, (k, d, g[k, d], fd)


def test_df_gradient_vs_finite_differences_sph_aux():
    """Same machinery in the solid-harmonic-projected fitting space (the
    energy path's default since the aux-conditioning fix): the FD oracle
    projects P3/M exactly as models/df*.py does before fitting."""
    import warnings

    from juliachem_jl_tpu.basis.spherical import (project_metric_sph,
                                                  project_rows_sph)
    from juliachem_jl_tpu.ops.eri3c import two_center_metric
    from juliachem_jl_tpu.ops.eri_grad import (_dense_three_center,
                                               df_two_electron_gradient)

    mol = molecule.from_input_dict(WATER)
    prim = basis_mod.build(mol, "STO-3G")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        aux = basis_mod.build_auxiliary(mol, "cc-pVDZ-JKFIT", "STO-3G")
    rng = np.random.default_rng(1)
    X = rng.standard_normal((prim.nbf, prim.nbf))
    D = X + X.T

    def e2(coords):
        m = _mol_at(coords)
        p = basis_mod.build(m, "STO-3G")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            a = basis_mod.build_auxiliary(m, "cc-pVDZ-JKFIT", "STO-3G")
        P3f = project_rows_sph(
            a, _dense_three_center(p, a).reshape(a.nbf, -1))
        M = project_metric_sph(a, two_center_metric(a))
        P3 = P3f.reshape(len(P3f), p.nbf, p.nbf)
        v = P3f @ D.reshape(-1)
        U = (0.5 * v[:, None, None] * D[None]
             - 0.25 * np.einsum("pr,ars,sq->apq", D, P3, D))
        gam = np.linalg.solve(M, U.reshape(len(P3f), -1))
        return float(np.sum(gam * P3f))

    g = df_two_electron_gradient(prim, aux, mol, D, sph_aux=True)
    assert np.abs(g.sum(axis=0)).max() < 1e-10
    h = 1e-5
    for (k, d) in ((0, 2), (1, 1)):
        cp = mol.coords.copy(); cp[k, d] += h
        cm = mol.coords.copy(); cm[k, d] -= h
        fd = (e2(cp) - e2(cm)) / (2 * h)
        assert abs(g[k, d] - fd) < 1e-7, (k, d, g[k, d], fd)


def test_df_total_gradient_vs_scf_finite_differences():
    """gradient.run with scf_type=df: analytic gradient of the RI energy
    functional vs central differences of the converged DF-SCF energy."""
    import warnings

    from juliachem_jl_tpu.basis import CalculationBasisSets
    from juliachem_jl_tpu.models import rhf
    from juliachem_jl_tpu.models.gradient import total_gradient

    flags = {"scf_type": "df", "niter": 60, "dele": 1e-11, "rmsd": 1e-9,
             "guess": "hcore"}

    def scf(m):
        p = basis_mod.build(m, "STO-3G")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            a = basis_mod.build_auxiliary(m, "cc-pVDZ-JKFIT", "STO-3G")
        res = rhf.energy(m, CalculationBasisSets(p, a), flags)
        assert res["Converged?"]
        return res, p, a

    mol = molecule.from_input_dict(WATER)
    res, prim, aux = scf(mol)
    g = total_gradient(mol, prim, np.asarray(res["Density"]),
                       np.asarray(res["W"]), aux=aux)
    assert np.abs(g.sum(axis=0)).max() < 1e-8
    h = 2e-4
    k, d = 0, 2
    cp = mol.coords.copy(); cp[k, d] += h
    cm = mol.coords.copy(); cm[k, d] -= h
    fd = (scf(_mol_at(cp))[0]["Energy"] - scf(_mol_at(cm))[0]["Energy"]) / (2 * h)
    assert abs(g[k, d] - fd) < 5e-6, (g[k, d], fd)


def test_driver_gradient_end_to_end(tmp_path):
    """driver="gradient" routes through the full input-file pipeline (our
    extension; the reference's JCInput accepts only "energy")."""
    import json

    from juliachem_jl_tpu.driver import run_file

    inp = {
        "molecule": {"symbols": ["H", "H"],
                     "geometry": [0.0, 0.0, 0.0, 0.0, 0.0, 0.74],
                     "molecular_charge": 0},
        "driver": "gradient",
        "model": {"method": "RHF", "basis": "STO-3G"},
        "keywords": {"scf": {"niter": 50, "dele": 1e-10, "rmsd": 1e-8,
                             "guess": "hcore"}},
    }
    path = tmp_path / "h2_grad.json"
    path.write_text(json.dumps(inp))
    out = run_file(str(path))
    g = out["Energy"]["Gradient"]
    assert g.shape == (2, 3)
    assert np.abs(g.sum(axis=0)).max() < 1e-10
    # near re=0.74 A the H2/STO-3G PES slope is small but nonzero
    assert 1e-4 < abs(g[1, 2]) < 0.1


def test_total_uhf_gradient_vs_finite_differences():
    """Analytic UHF gradient (spin two-particle density) vs central
    differences of the converged UHF energy (OH radical, 6-31G)."""
    from juliachem_jl_tpu.models import gradient, uhf

    flags = {"niter": 80, "dele": 1e-11, "rmsd": 1e-9, "guess": "sad"}

    def mk(dz):
        return molecule.from_input_dict({
            "symbols": ["O", "H"],
            "geometry": [0, 0, 0, 0, 0, 0.97 + dz],
            "molecular_multiplicity": 2,
        })

    mol = mk(0.0)
    b = basis_mod.run(mol, {"basis": "6-31G"})
    res = gradient.run(mol, b, flags, method="UHF")
    g = res["Gradient"]
    assert np.abs(g.sum(axis=0)).max() < 1e-10   # translational invariance

    from juliachem_jl_tpu.utils.elements import ANGSTROM_TO_BOHR

    h = 1e-4
    def e_at(dz):
        m2 = mk(dz)
        b2 = basis_mod.run(m2, {"basis": "6-31G"})
        r = uhf.energy(m2, b2, flags)
        assert r["Converged?"]
        return r["Energy"]

    fd = (e_at(h) - e_at(-h)) / (2 * h * ANGSTROM_TO_BOHR)
    assert abs(g[1, 2] - fd) < 5e-7


def test_total_df_uhf_gradient_vs_finite_differences():
    """Analytic DF-UHF gradient (RI-fitted unrestricted functional) vs
    central differences of the converged DF-UHF energy."""
    import warnings

    from juliachem_jl_tpu.basis import CalculationBasisSets
    from juliachem_jl_tpu.models import gradient, uhf

    flags = {"scf_type": "df", "niter": 80, "dele": 1e-11, "rmsd": 1e-9,
             "guess": "sad"}

    def mk(dz):
        return molecule.from_input_dict({
            "symbols": ["O", "H"],
            "geometry": [0, 0, 0, 0, 0, 0.97 + dz],
            "molecular_multiplicity": 2,
        })

    def bs(m):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            return CalculationBasisSets(
                basis_mod.build(m, "6-31G"),
                basis_mod.build_auxiliary(m, "cc-pVTZ-JKFIT", "6-31G"))

    mol = mk(0.0)
    res = gradient.run(mol, bs(mol), flags, method="UHF")
    g = res["Gradient"]
    assert np.abs(g.sum(axis=0)).max() < 1e-10

    from juliachem_jl_tpu.utils.elements import ANGSTROM_TO_BOHR

    h = 1e-4
    def e_at(dz):
        m2 = mk(dz)
        r = uhf.energy(m2, bs(m2), flags)
        assert r["Converged?"]
        return r["Energy"]

    fd = (e_at(h) - e_at(-h)) / (2 * h * ANGSTROM_TO_BOHR)
    assert abs(g[1, 2] - fd) < 5e-7


def test_total_rohf_gradient_vs_finite_differences():
    """Analytic ROHF gradient via the general SCF Pulay weight
    W = 1/2 sum_s (D_s F_s S^-1 + h.c.) vs central differences."""
    from juliachem_jl_tpu.models import gradient, rohf

    flags = {"niter": 100, "dele": 1e-11, "rmsd": 1e-9}

    def mk(dz):
        return molecule.from_input_dict({
            "symbols": ["O", "H"],
            "geometry": [0, 0, 0, 0, 0, 0.97 + dz],
            "molecular_multiplicity": 2,
        })

    mol = mk(0.0)
    res = gradient.run(mol, basis_mod.run(mol, {"basis": "6-31G"}), flags,
                       method="ROHF")
    g = res["Gradient"]
    assert np.abs(g.sum(axis=0)).max() < 1e-10

    from juliachem_jl_tpu.utils.elements import ANGSTROM_TO_BOHR

    h = 1e-4
    def e_at(dz):
        m2 = mk(dz)
        r = rohf.energy(m2, basis_mod.run(m2, {"basis": "6-31G"}), flags)
        assert r["Converged?"]
        return r["Energy"]

    fd = (e_at(h) - e_at(-h)) / (2 * h * ANGSTROM_TO_BOHR)
    assert abs(g[1, 2] - fd) < 5e-7
