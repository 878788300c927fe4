"""Harmonic vibrational analysis: numerical Hessian of the ANALYTIC
gradient.

EXCEEDS the reference (no working gradients upstream, hence no Hessians).
The Hessian is built by central differences of the analytic nuclear
gradient — 6N gradient evaluations, each O(SCF) — then symmetrized,
mass-weighted and diagonalized; translations/rotations are projected out
by eigenvalue magnitude.  Frequencies in cm^-1 (imaginary modes returned
as negative numbers, the usual convention).
"""

from __future__ import annotations

import numpy as np

from .. import basis as basis_mod
from .. import molecule as molecule_mod
from ..utils import elements

# unit chain: Hessian eigenvalues are Eh / (bohr^2 amu) after mass
# weighting; convert to angular frequency and then wavenumbers.
_HARTREE_J = 4.3597447222071e-18
_BOHR_M = 5.29177210903e-11
_AMU_KG = 1.66053906660e-27
_C_CM_S = 2.99792458e10
_EIG_TO_CM1 = (np.sqrt(_HARTREE_J / (_BOHR_M ** 2 * _AMU_KG))
               / (2.0 * np.pi * _C_CM_S))


def hessian(mol, model: dict, scf_flags: dict | None = None,
            method: str = "RHF", step: float = 5.0e-3,
            output: int = 0) -> np.ndarray:
    """Numerical [3N, 3N] Cartesian Hessian (Eh/bohr^2) by central
    differences of the analytic gradient (step in bohr)."""
    from . import gradient as gradient_mod

    flags = dict(scf_flags or {})
    flags.setdefault("dele", 1e-10)
    flags.setdefault("rmsd", 1e-8)
    flags.setdefault("niter", 100)
    n3 = 3 * mol.natom
    H = np.zeros((n3, n3))

    def grad_at(x):
        m = molecule_mod.Molecule(
            z=mol.z, symbols=mol.symbols, coords=x.reshape(-1, 3),
            charge=mol.charge, multiplicity=mol.multiplicity)
        bsets = basis_mod.run(m, model)
        res = gradient_mod.run(m, bsets, flags, method=method)
        return np.asarray(res["Gradient"]).reshape(-1)

    x0 = np.asarray(mol.coords, dtype=np.float64).reshape(-1)
    for k in range(n3):
        xp = x0.copy(); xp[k] += step
        xm = x0.copy(); xm[k] -= step
        H[k] = (grad_at(xp) - grad_at(xm)) / (2.0 * step)
        if output >= 1:
            print(f"hessian row {k + 1}/{n3}")
    return 0.5 * (H + H.T)


def frequencies(mol, model: dict, scf_flags: dict | None = None,
                method: str = "RHF", step: float = 5.0e-3,
                output: int = 0) -> dict:
    """Harmonic frequencies (cm^-1) and normal modes.

    Returns {"Frequencies": [n_vib] cm^-1 (negative = imaginary),
    "Modes": [n_vib, 3N] mass-weighted normal modes, "Hessian": [3N, 3N],
    "All Frequencies": all 3N values incl. trans/rot (near zero)}.
    """
    H = hessian(mol, model, scf_flags, method=method, step=step,
                output=output)
    masses = np.array([elements.mass(int(z)) for z in mol.z])
    inv_sqrt_m = np.repeat(1.0 / np.sqrt(masses), 3)
    Hm = H * inv_sqrt_m[:, None] * inv_sqrt_m[None, :]
    w, V = np.linalg.eigh(Hm)
    freqs_all = np.sign(w) * np.sqrt(np.abs(w)) * _EIG_TO_CM1
    # drop the 3 translations + 2/3 rotations (smallest |freq|)
    n_tr = 5 if mol.natom == 2 else (3 if mol.natom == 1 else 6)
    order = np.argsort(np.abs(freqs_all))
    vib_idx = np.sort(order[n_tr:])
    return {
        "Frequencies": freqs_all[vib_idx],
        "Modes": V[:, vib_idx].T,
        "Hessian": H,
        "All Frequencies": freqs_all,
    }
