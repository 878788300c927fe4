"""Feature regression tests: checkpoint/restart, fdiff, mixed precision,
debug dumps, SAD guess, DF-guess two-phase SCF, molecule analysis, timings."""

import os
import tempfile

import numpy as np
import pytest

from juliachem_jl_tpu import basis, molecule
from juliachem_jl_tpu.basis import CalculationBasisSets
from juliachem_jl_tpu.models import rhf

WATER = {
    "symbols": ["O", "H", "H"],
    "geometry": [0.0, 0.0, 0.116321, 0.0, 0.751155, -0.465285, 0.0, -0.751155, -0.465285],
}
TIGHT = {"niter": 60, "dele": 1e-9, "rmsd": 1e-7}
E_REF = -74.9617539687  # water STO-3G (validated vs survey golden)


def _b(mol, name="STO-3G", aux=None):
    return CalculationBasisSets(
        basis.build(mol, name),
        basis.build_auxiliary(mol, aux, name) if aux else None,
    )


@pytest.fixture(scope="module")
def mol():
    return molecule.from_input_dict(WATER)


def test_checkpoint_restart(mol, tmp_path_factory):
    d = tmp_path_factory.mktemp("ck")
    ck = str(d / "ck.npz")
    b = _b(mol)
    r1 = rhf.energy(mol, b, {**TIGHT, "niter": 3, "checkpoint": ck})
    assert not r1["Converged?"] and r1["Error"] is not None
    assert r1["Error"]["error_type"] == "convergence_error"
    r2 = rhf.energy(mol, b, {**TIGHT, "restart": ck})
    assert r2["Converged?"]
    assert abs(r2["Energy"] - E_REF) < 1e-8


def test_fdiff_incremental_fock(mol):
    b = _b(mol)
    r = rhf.energy(mol, b, {**TIGHT, "fdiff": True})
    assert r["Converged?"]
    assert abs(r["Energy"] - E_REF) < 1e-8


def test_fdiff_with_df_builder(mol):
    """fdiff passes an *indefinite* dD to the Fock builder; the DF builder's
    signed eigenfactorization must keep the exchange increments exact
    (round-1 advisor finding: the positive-only factorization silently gave
    -76.47 instead of -74.96 here)."""
    b = _b(mol, "STO-3G", aux="cc-pVDZ-JKFIT")
    r_plain = rhf.energy(mol, b, {**TIGHT, "scf_type": "df"})
    r_fdiff = rhf.energy(mol, b, {**TIGHT, "scf_type": "df", "fdiff": True})
    assert r_plain["Converged?"] and r_fdiff["Converged?"]
    assert abs(r_fdiff["Energy"] - r_plain["Energy"]) < 1e-7


def test_checkpoint_rejects_wrong_system(mol, tmp_path_factory):
    """Restarting with a different molecule/basis must be refused
    (round-1 advisor finding: silently produced meaningless energies)."""
    d = tmp_path_factory.mktemp("ckx")
    ck = str(d / "ck.npz")
    b = _b(mol)
    rhf.energy(mol, b, {**TIGHT, "niter": 2, "checkpoint": ck})
    other = molecule.from_input_dict({
        "symbols": ["O", "H", "H"],
        "geometry": [0.0, 0.0, 0.3, 0.0, 0.8, -0.5, 0.0, -0.8, -0.5],
    })
    b2 = _b(other)
    with pytest.raises(ValueError, match="refusing to restart"):
        rhf.energy(other, b2, {**TIGHT, "restart": ck})


def test_basis_lookup_casefold_and_warnings():
    import warnings as _warnings

    from juliachem_jl_tpu.basis import library

    assert library.lookup("O", "cc-pvdz") == library.lookup("O", "cc-pVDZ")
    # every bundled table is now verified (see __meta__.verification_notes;
    # F 6-31G family validated against Szabo-Ostlund / CCCBDB goldens), so
    # lookups must be warning-free...
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        library.lookup("F", "6-31G")
    # ...while the quality-warning machinery itself stays armed for any
    # future flagged entry
    meta = library._library().setdefault("__meta__", {})
    meta.setdefault("unverified_vs_goldens", []).append(["6-31G", "F"])
    try:
        with pytest.warns(UserWarning, match="unverified"):
            library.lookup("F", "6-31G")
    finally:
        meta["unverified_vs_goldens"].remove(["6-31G", "F"])


def test_sad_guess(mol):
    b = _b(mol)
    r = rhf.energy(mol, b, {**TIGHT, "guess": "sad"})
    assert r["Converged?"]
    assert abs(r["Energy"] - E_REF) < 1e-8


def test_mixed_precision_equivalence(mol):
    b = _b(mol, "STO-3G", aux="cc-pVDZ-JKFIT")
    r64 = rhf.energy(mol, b, {**TIGHT, "scf_type": "df", "mixed_precision": False})
    r32 = rhf.energy(mol, b, {**TIGHT, "scf_type": "df", "mixed_precision": True})
    assert r64["Converged?"] and r32["Converged?"]
    assert abs(r64["Energy"] - r32["Energy"]) < 1e-9


def test_df_guess_two_phase(mol):
    # DF warm-up then conventional (reference SCF.jl:527-550)
    b = _b(mol, "STO-3G", aux="cc-pVDZ-JKFIT")
    r = rhf.energy(mol, b, {**TIGHT, "guess": "df", "df_niter": 5})
    assert r["Converged?"]
    assert abs(r["Energy"] - E_REF) < 1e-8


def test_debug_dump(mol, tmp_path):
    import h5py

    b = _b(mol)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rhf.energy(mol, b, {**TIGHT, "niter": 2, "debug": True})
        with h5py.File("debug.h5") as f:
            keys = set(f.keys())
    finally:
        os.chdir(cwd)
    assert {"overlap", "kinetic", "nuc_attr", "core_hamiltonian", "fock"} <= keys


def test_timings_dump(mol, tmp_path):
    b = _b(mol)
    r = rhf.energy(mol, b, TIGHT)
    t = r["Timings"]
    assert t.converged and abs(t.scf_energy - E_REF) < 1e-8
    p = str(tmp_path / "t.json")
    t.save_json(p)
    import json

    d = json.load(open(p))
    assert any(k.startswith("fock_time-") for k in d["timings"])
    t.save_hdf5(str(tmp_path / "t.h5"))


def test_molecule_analysis(mol):
    from juliachem_jl_tpu.molecule import analysis

    bl = analysis.bonds(mol)
    assert len(bl) == 2  # two O-H bonds
    angles = analysis.bond_angles(mol, bl)
    assert len(angles) == 1
    assert abs(angles[0][3] - 104.5) < 1.0


def test_nuclear_gradient_and_stub(mol):
    from juliachem_jl_tpu.models import gradient

    g = gradient.nuclear_repulsion_gradient(mol)
    assert g.shape == (3, 3)
    # translational invariance: forces sum to zero
    assert np.abs(g.sum(axis=0)).max() < 1e-12
    # finite-difference check on atom 1, coordinate y
    eps = 1e-6
    m_p = molecule.Molecule(mol.z, mol.symbols, mol.coords.copy(), mol.charge)
    m_p.coords[1, 1] += eps
    m_m = molecule.Molecule(mol.z, mol.symbols, mol.coords.copy(), mol.charge)
    m_m.coords[1, 1] -= eps
    fd = (m_p.nuclear_repulsion() - m_m.nuclear_repulsion()) / (2 * eps)
    assert abs(g[1, 1] - fd) < 1e-6
    # gradients are fully implemented since round 3 (conventional + DF,
    # RHF + UHF — beyond the reference's disabled stub); the driver must
    # still validate its inputs before touching state
    with pytest.raises(ValueError):
        gradient.run(mol, None)


def test_scf_options_printer(capsys):
    from juliachem_jl_tpu.utils.options import create_scf_options, print_scf_options

    opts = create_scf_options({"scf_type": "df", "ndiis": 6})
    print_scf_options(opts)
    out = capsys.readouterr().out
    assert "ndiis" in out and "df" in out
