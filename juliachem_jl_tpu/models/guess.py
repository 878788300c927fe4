"""Initial-guess densities.

* hcore: F = H (lives in scf.initial_state; reference SCF.jl:107-117).
* SAD: superposition of atomic densities.  The reference reads precomputed
  per-atom density blocks from records/sadgss.h5 (EnergyHelpers.jl:142-170);
  we instead *compute* the spherically-averaged fractional-occupation atomic
  RHF density per unique element on the fly and cache it — no data file
  needed, and it works for any basis in the library.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import scipy.linalg as sla

# aufbau filling order: (l, capacity)
_AUFBAU = [(0, 2), (0, 2), (1, 6), (0, 2), (1, 6), (0, 2), (2, 10), (1, 6),
           (0, 2), (2, 10), (1, 6)]


def _fractional_occupations(eps: np.ndarray, nel: float, degen_tol: float = 1e-6):
    """Fill MOs in energy order; electrons within a degenerate set are spread
    equally (spherical averaging)."""
    occ = np.zeros_like(eps)
    rem = float(nel)
    i = 0
    n = len(eps)
    while rem > 1e-12 and i < n:
        j = i
        while j + 1 < n and abs(eps[j + 1] - eps[i]) < degen_tol:
            j += 1
        g = j - i + 1
        fill = min(2.0 * g, rem)
        occ[i : j + 1] = fill / g
        rem -= fill
        i = j + 1
    return occ


@lru_cache(maxsize=None)
def _atomic_scf(symbol: str, basis_name: str):
    """Spherically-averaged atomic RHF; returns (D_atom, E_atom, nbf)."""
    from .. import basis as basis_mod
    from .. import molecule as molecule_mod
    from ..ops.eri import full_eri_tensor
    from ..ops.oei import overlap_kinetic_nuclear

    mol = molecule_mod.from_input_dict(
        {"symbols": [symbol], "geometry": [0.0, 0.0, 0.0], "molecular_charge": 0}
    )
    b = basis_mod.build(mol, basis_name)
    S, T, V = overlap_kinetic_nuclear(b, mol)
    H = T + V
    G = full_eri_tensor(b)
    nel = float(mol.z[0])

    # canonical orthogonalization
    s, U = np.linalg.eigh(S)
    keep = s > 1e-10
    X = U[:, keep] / np.sqrt(s[keep])

    def density(F):
        Fp = X.T @ F @ X
        eps, Cp = np.linalg.eigh(Fp)
        C = X @ Cp
        occ = _fractional_occupations(eps, nel)
        return (C * occ[None, :]) @ C.T, eps

    D, _ = density(H)
    E = 0.0
    for it in range(80):
        J = np.einsum("pqrs,rs->pq", G, D)
        K = np.einsum("prqs,rs->pq", G, D)
        F = H + J - 0.5 * K
        E_new = 0.5 * float(np.sum(D * (H + F)))
        D_new, _ = density(F)
        # static mixing for open-shell fractional-occupation stability
        D = 0.6 * D_new + 0.4 * D
        if abs(E_new - E) < 1e-10 and it > 4:
            E = E_new
            break
        E = E_new
    return D, E, b.nbf


def atomic_rhf_energy(symbol: str, basis_name: str) -> float:
    return _atomic_scf(symbol, basis_name)[1]


def sad_guess(mol, basis) -> np.ndarray:
    """Block-diagonal superposition-of-atomic-densities guess
    (EnergyHelpers.jl:142-170 analog)."""
    D = np.zeros((basis.nbf, basis.nbf))
    # per-atom function ranges follow shell offsets
    atom_slices: dict[int, list[int]] = {}
    for s in basis.shells:
        atom_slices.setdefault(s.atom, []).extend(
            range(s.offset, s.offset + s.nbf)
        )
    for ia, sym in enumerate(mol.symbols):
        Da, _, nbf_a = _atomic_scf(sym, basis.name)
        idx = np.array(atom_slices[ia])
        assert len(idx) == nbf_a, (sym, len(idx), nbf_a)
        D[np.ix_(idx, idx)] = Da
    return D
