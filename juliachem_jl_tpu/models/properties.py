"""Molecular properties (parity with src/rhf/properties/Properties.jl).

Keyword-driven: {"mo energies": true, "mulliken": true, "multipole": "dipole",
"formation": true} — same keys as the reference (Properties.jl:26-177).
"""

from __future__ import annotations

import numpy as np

from ..utils.elements import AU_TO_DEBYE


def mo_energies(result) -> dict:
    """MO energies + HOMO-LUMO gap (Properties.jl:44-94, OrbitalEnergies.jl)."""
    eps = np.asarray(result["MO Energies"])
    nocc = int(round(np.trace(result["Density"] @ result["Overlap"]) / 2.0))
    homo = eps[nocc - 1]
    lumo = eps[nocc] if nocc < len(eps) else np.nan
    return {"energies": eps, "homo": homo, "lumo": lumo,
            "homo_lumo": float(lumo - homo)}


def _bf_to_atom(basis, result) -> np.ndarray:
    """Per-bf atom map in the run's computational basis (spherical runs
    carry fewer functions per shell than the Cartesian compiled basis)."""
    if result.get("Spherical Transform") is not None:
        from ..basis.spherical import sph_bf_to_atom

        return sph_bf_to_atom(basis)
    return basis.bf_to_atom()


def mulliken_populations(mol, basis, result) -> np.ndarray:
    """Per-atom Mulliken populations from (D * S) block sums
    (Mulliken.jl:3-60)."""
    D = np.asarray(result["Density"])
    S = np.asarray(result["Overlap"])
    ds = D * S
    bf_atom = _bf_to_atom(basis, result)
    pops = np.zeros(mol.natom)
    np.add.at(pops, bf_atom, ds.sum(axis=1))
    return pops


def mulliken_charges(mol, basis, result) -> np.ndarray:
    return np.asarray(mol.z, dtype=float) - mulliken_populations(mol, basis, result)


def lowdin_populations(mol, basis, result) -> np.ndarray:
    """Per-atom Lowdin populations diag(S^1/2 D S^1/2) block-summed —
    basis-orthogonalized and less basis-set-sensitive than Mulliken
    (capability beyond the reference's Mulliken-only analysis)."""
    D = np.asarray(result["Density"])
    S = np.asarray(result["Overlap"])
    w, U = np.linalg.eigh(S)
    S_half = (U * np.sqrt(np.maximum(w, 0.0))[None, :]) @ U.T
    diag = np.einsum("pq,qr,rp->p", S_half, D, S_half)
    bf_atom = _bf_to_atom(basis, result)
    pops = np.zeros(mol.natom)
    np.add.at(pops, bf_atom, diag)
    return pops


def dipole_moment(mol, basis, result) -> dict:
    """Nuclear + electronic dipole in Debye (Multipole.jl:60-117)."""
    from ..ops.oei import dipole_matrices

    D = np.asarray(result["Density"])
    T = result.get("Spherical Transform")
    if T is not None:
        # tr(D_s T^T M T) = tr((T D_s T^T) M): map the spherical density to
        # Cartesian once and reuse the Cartesian dipole integrals
        D = T @ D @ T.T
    mx, my, mz = dipole_matrices(basis, origin=np.zeros(3))
    el = -np.array([np.sum(D * mx), np.sum(D * my), np.sum(D * mz)])
    nuc = (np.asarray(mol.z, dtype=float)[:, None] * mol.coords).sum(axis=0)
    total = (nuc + el) * AU_TO_DEBYE
    return {
        "nuclear": nuc, "electronic": el, "total": total,
        "moment": float(np.linalg.norm(total)),
    }


def formation_energy(mol, basis, result, atom_energies: dict | None = None) -> float:
    """E_formation = E_tot - sum_atoms E_atom (FormationEnergies.jl:5-29).

    atom_energies: {symbol: E} reference atomic energies for the same
    method/basis (the reference reads records/eatom.h5)."""
    from ..basis.eatom import lookup_atom_energy

    e = float(result["Energy"])
    for sym in mol.symbols:
        e -= lookup_atom_energy(sym, basis.name, atom_energies)
    return e


def run(mol, basis_sets, rhf_result, prop_keywords: dict | None = None, output: int = 0) -> dict:
    """API parity with JCRHF.Properties.run (Properties.jl:26-42)."""
    kw = prop_keywords or {}
    basis = basis_sets.primary if hasattr(basis_sets, "primary") else basis_sets
    out: dict = {}
    if kw.get("mo energies"):
        out["MO Energies"] = mo_energies(rhf_result)
        if output >= 1:
            print(f"HOMO-LUMO gap: {out['MO Energies']['homo_lumo']:.6f} h")
    if kw.get("mulliken"):
        out["Mulliken Population"] = mulliken_populations(mol, basis, rhf_result)
        if output >= 1:
            print("Mulliken populations:", out["Mulliken Population"])
        if rhf_result.get("Spin Density") is not None:
            # open-shell (UHF/ROHF): per-atom spin populations from the
            # spin-density Mulliken sums (alpha minus beta)
            spin_res = {"Density": rhf_result["Spin Density"],
                        "Overlap": rhf_result["Overlap"],
                        "Spherical Transform":
                            rhf_result.get("Spherical Transform")}
            out["Mulliken Spin Population"] = mulliken_populations(
                mol, basis, spin_res)
            if output >= 1:
                print("Mulliken spin populations:",
                      out["Mulliken Spin Population"])
    if kw.get("lowdin"):
        out["Lowdin Population"] = lowdin_populations(mol, basis, rhf_result)
        if output >= 1:
            print("Lowdin populations:", out["Lowdin Population"])
    if kw.get("multipole") == "dipole":
        out["Dipole"] = dipole_moment(mol, basis, rhf_result)
        if output >= 1:
            print(f"Dipole moment: {out['Dipole']['moment']:.6f} D")
    if kw.get("formation"):
        out["Formation Energy"] = formation_energy(mol, basis, rhf_result)
    return out
