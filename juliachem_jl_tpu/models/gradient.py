"""RHF nuclear gradients.

Parity note: the reference scaffolds gradients but explicitly disables them
("does not yet support RHF gradients", src/rhf/gradient/Gradient.jl:31-32),
while fully implementing the helper assembly (GradHelpers.jl).  Here we ship
the same surface with one working piece the reference also has — the nuclear
repulsion gradient — and raise for the full electronic gradient exactly as
the reference does.  (The JAX-native plan is autodiff through a fully
differentiable integral path; the current production path stages host-side
batch construction, which breaks the tape.)
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


def run(mol, basis_sets, scf_flags=None, output: int = 0):
    """API parity with JCRHF.Gradient.run (Gradient.jl:31-32)."""
    raise NotImplementedError(
        "juliachem_jl_tpu does not yet support full RHF gradients "
        "(parity with reference Gradient.jl:31-32); "
        "nuclear_repulsion_gradient() is available"
    )
