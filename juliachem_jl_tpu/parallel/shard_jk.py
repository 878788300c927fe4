"""Spin-resolved J/K over the device mesh (multi-chip UHF/ROHF).

One shard_map pass over the packed Q-row-sharded B computes the Coulomb
vector of the total density together with BOTH spin exchanges — each
device expands its Q-blocks to dense tiles once and contracts them against
the alpha and beta occupied factors, then one psum finishes all three
reductions.  This is the open-shell analog of
parallel/shard.py::make_packed_fock_step (the reference's GPUDF.jl has no
open-shell counterpart: its SCF is RHF-only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def make_packed_jk_step(mesh: Mesh, A_pad: int, npq1: int, nbf: int,
                        q_chunk: int, n_chunks: int, dtype=jnp.float64):
    """Jitted sharded (J, Ka, Kb) on packed screened-pq B.

    Signature: jk(B, d_packed [npq+1], Cs_a [nbf,ka], s_a [ka],
                  Cs_b [nbf,kb], s_b [kb], col_map, pq_flat)
    with factor-1 spin densities D_s = sum_k s_k c_k c_k^T, so the
    returned Ka/Kb are exactly K(Da)/K(Db) and J is J(Da+Db) when
    d_packed gathers Da+Db.
    """
    axes = ("q", "k")

    def local_jk(B_blk, d, Cs_a, s_a, Cs_b, s_b, col_map, pq_flat):
        Br = B_blk.reshape(n_chunks, q_chunk, npq1)
        K0 = jnp.zeros((nbf, nbf), dtype=dtype)
        Jp0 = jnp.zeros(npq1, dtype=dtype)

        def body(carry, Bc):
            Ka, Kb, Jp = carry
            Vc = Bc @ d
            Jp = Jp + Vc @ Bc
            tile = Bc[:, col_map].reshape(q_chunk, nbf, nbf)
            Wa = jnp.einsum("qmn,mi->qin", tile, Cs_a)
            Ka = Ka + jnp.einsum("qim,qin->mn", Wa * s_a[None, :, None], Wa)
            Wb = jnp.einsum("qmn,mi->qin", tile, Cs_b)
            Kb = Kb + jnp.einsum("qim,qin->mn", Wb * s_b[None, :, None], Wb)
            return (Ka, Kb, Jp), 0

        (Ka, Kb, Jp), _ = jax.lax.scan(body, (K0, K0, Jp0), Br)
        Ka = jax.lax.psum(Ka, axes).astype(jnp.float64)
        Kb = jax.lax.psum(Kb, axes).astype(jnp.float64)
        Jp = jax.lax.psum(Jp, axes).astype(jnp.float64)
        J = jnp.zeros(nbf * nbf).at[pq_flat].set(Jp[:-1]).reshape(nbf, nbf)
        return J, Ka, Kb

    jk = shard_map(
        local_jk,
        mesh=mesh,
        in_specs=(P(("q", "k"), None), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(jk)
