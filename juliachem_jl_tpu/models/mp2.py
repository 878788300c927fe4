"""RI-MP2 correlation energy on the density-fitted 3-index tensor.

The reference snapshot has no MP2 code (SURVEY.md header), but its data
artifacts anticipate it (eatom.h5 ships RIMP2 atomic energies; inputs are
named *_MP2.json; cc-pVDZ-RIFIT appears in 41 inputs).  This implements the
standard RI-MP2:

    B_ia^Q = sum_{mu nu} C_mu i  B^Q_{mu nu}  C_nu a          (AO->MO)
    (ia|jb) = sum_Q B_ia^Q B_jb^Q
    E2 = sum_{ijab} (ia|jb) [ 2 (ia|jb) - (ib|ja) ] / (e_i + e_j - e_a - e_b)

TPU mapping: the AO->MO transform is two gemms; the ij-pair loop is a
lax.scan of [nvirt, nvirt] gemms — all MXU work.  Multi-chip: the Q axis of
B_ia is contracted locally per shard and psum'd (see parallel/shard.py
pattern); the ij scan parallelizes over the mesh by i-blocks.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def _mo_b(B, Cocc, Cvirt):
    """B_ia^Q: [A, nocc, nvirt]."""
    t = jnp.einsum("qmn,mi->qin", B, Cocc)
    return jnp.einsum("qin,na->qia", t, Cvirt)


def _e2_kernel(Bia, eps_occ, eps_virt):
    """Scan over occupied i; for each i one gemm gives (ia|jb) for all j."""
    nocc = Bia.shape[1]

    def body(carry, i):
        # iab: [nocc, nvirt, nvirt] = (ia|jb) for this i over all j
        Bi = Bia[:, i, :]                                    # [A, nvirt]
        iajb = jnp.einsum("qa,qjb->jab", Bi, Bia)            # [nocc, nv, nv]
        denom = (
            eps_occ[i]
            + eps_occ[:, None, None]
            - eps_virt[None, :, None]
            - eps_virt[None, None, :]
        )
        t = iajb / denom
        e = jnp.sum(t * (2.0 * iajb - jnp.swapaxes(iajb, -1, -2)))
        return carry + e, None

    total, _ = jax.lax.scan(body, 0.0, jnp.arange(nocc))
    return total


_e2_jit = jax.jit(_e2_kernel)


def ri_mp2_energy(rhf_result, basis_sets, mol=None, B=None, opts=None) -> dict:
    """Compute the RI-MP2 correlation energy from a converged RHF result.

    Uses the auxiliary basis of basis_sets (RIFIT recommended); reuses a
    prebuilt B tensor if given.
    """
    from .df import build_B

    primary = basis_sets.primary
    aux = basis_sets.auxiliary
    if B is None:
        if aux is None:
            raise ValueError("RI-MP2 requires an auxiliary basis")
        B = build_B(primary, aux, opts)
    B = jnp.asarray(B)

    C = np.asarray(rhf_result["MO Coeff"])
    eps = np.asarray(rhf_result["MO Energies"])
    nocc = int(primary.nels // 2)
    Cocc, Cvirt = C[:, :nocc], C[:, nocc:]
    eps_occ, eps_virt = eps[:nocc], eps[nocc:]

    Bia = _mo_b(B, jnp.asarray(Cocc), jnp.asarray(Cvirt))
    e2 = float(_e2_jit(Bia, jnp.asarray(eps_occ), jnp.asarray(eps_virt)))
    return {
        "E2": e2,
        "Energy": float(rhf_result["Energy"]) + e2,
        "E_HF": float(rhf_result["Energy"]),
    }
