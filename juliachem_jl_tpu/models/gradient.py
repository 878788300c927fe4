"""RHF nuclear gradients.

Parity note: the reference scaffolds gradients but explicitly disables them
("does not yet support RHF gradients", src/rhf/gradient/Gradient.jl:31-32),
while fully implementing the one-electron helper assembly (GradHelpers.jl:
65-467).  We ship the same surface: the nuclear-repulsion gradient and the
complete one-electron gradient assembly (core-Hamiltonian + Pulay overlap
forces from the derivative S/T/V matrices in ops/oei_grad.py) both work;
run() raises for the still-missing two-electron (ERI-derivative) term exactly
as the reference does.
"""

from __future__ import annotations

import numpy as np


def nuclear_repulsion_gradient(mol) -> np.ndarray:
    """d E_nuc / d R: reference GradHelpers.jl:38-63."""
    coords = mol.coords
    z = np.asarray(mol.z, dtype=float)
    diff = coords[:, None, :] - coords[None, :, :]      # [i, j, 3]
    r2 = (diff**2).sum(-1)
    np.fill_diagonal(r2, 1.0)
    inv_r3 = 1.0 / np.sqrt(r2) ** 3
    np.fill_diagonal(inv_r3, 0.0)
    zz = np.outer(z, z)
    return -(zz[:, :, None] * inv_r3[:, :, None] * diff).sum(axis=1)


def one_electron_gradient(mol, basis, D: np.ndarray, W: np.ndarray) -> np.ndarray:
    """The one-electron part of dE/dR (GradHelpers.jl:65-467 assembly):

        grad[k] = sum_pq D_pq (dT + dV)_pq/dR_k  -  sum_pq W_pq dS_pq/dR_k

    D is the (factor-2) SCF density and W the energy-weighted density
    (scf.energy_weighted_density).  The missing piece for a total RHF
    gradient is the two-electron ERI-derivative term (absent in the
    reference as well)."""
    from ..ops.oei_grad import stv_gradients

    dS, dT, dV = stv_gradients(basis, mol)
    dH = dT + dV
    grad = np.einsum("pq,kdpq->kd", D, dH) - np.einsum("pq,kdpq->kd", W, dS)
    return grad


def run(mol, basis_sets, scf_flags=None, output: int = 0):
    """API parity with JCRHF.Gradient.run (Gradient.jl:31-32)."""
    raise NotImplementedError(
        "juliachem_jl_tpu does not yet support full RHF gradients: the "
        "two-electron (ERI-derivative) term is not implemented (parity with "
        "reference Gradient.jl:31-32).  Available pieces: "
        "nuclear_repulsion_gradient() and one_electron_gradient()."
    )
