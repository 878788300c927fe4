"""3-center (Q|mu nu) and 2-center (P|Q) integrals for density fitting.

Replaces the reference's DFRHFTEIEngine (deps/src/jeri-df-tei.hpp:51-95) and
the assembly loops in DensityFitting/{TwoCenterIntegrals,ThreeCenterIntegrals,
ThreeCenterIntegralsScreened}.jl.  Both reduce to the 4-center class kernel
with "unit" ket shells (exponent 0, coefficient 1 — the same xs_xx trick the
reference uses via libint's unit shell).
"""

from __future__ import annotations

import numpy as np

from ..basis.structs import Basis, ncart
from .eri import eri_block
from .pairs import PairBlock, block_scatter_indices, unique_pair_blocks


def aux_unit_blocks(aux: Basis) -> list[PairBlock]:
    """Each auxiliary shell paired with a unit s-shell -> PairBlock per class."""
    blocks = []
    for l, cl in sorted(aux.classes.items()):
        n = cl.nshell
        blocks.append(
            PairBlock(
                la=l, lb=0,
                ish=cl.shell_idx, jsh=np.full(n, -1),
                aexp=cl.exps, bexp=np.zeros((n, 1)),
                acoef=cl.coefs, bcoef=np.ones((n, 1)),
                A=cl.centers, B=cl.centers,
                off_a=cl.offsets, off_b=np.zeros(n, dtype=np.int64),
            )
        )
    return blocks


def two_center_metric(aux: Basis) -> np.ndarray:
    """(P|Q) Coulomb metric over the auxiliary basis
    (TwoCenterIntegrals.jl analog)."""
    A = aux.nbf
    out = np.zeros((A, A))
    blocks = aux_unit_blocks(aux)
    for bi, bra in enumerate(blocks):
        for ket in blocks[bi:]:
            r, c = np.meshgrid(np.arange(bra.n), np.arange(ket.n), indexing="ij")
            sel_b, sel_k = r.ravel(), c.ravel()
            vals = eri_block(bra, ket, sel_b, sel_k)     # [N, ncp, ncq]
            ncp, ncq = ncart(bra.la), ncart(ket.la)
            ip = bra.off_a[sel_b][:, None, None] + np.arange(ncp)[None, :, None]
            iq = ket.off_a[sel_k][:, None, None] + np.arange(ncq)[None, None, :]
            ip = np.broadcast_to(ip, vals.shape)
            iq = np.broadcast_to(iq, vals.shape)
            out[ip, iq] = vals
            out[iq.transpose(0, 2, 1), ip.transpose(0, 2, 1)] = vals.transpose(0, 2, 1)
    return out


def three_center_tensor(
    primary: Basis,
    aux: Basis,
    pair_blocks: list[PairBlock] | None = None,
    chunk: int = 2048,
) -> np.ndarray:
    """Dense (A, nbf, nbf) tensor of (Q | mu nu) integrals.

    pair_blocks may be pre-screened (Schwarz) unique pair blocks; default is
    all unique pairs.  Both (mu,nu) and (nu,mu) entries are filled.
    """
    A, nbf = aux.nbf, primary.nbf
    out = np.zeros((A, nbf, nbf))
    if pair_blocks is None:
        pair_blocks = unique_pair_blocks(primary)
    for aux_blk in aux_unit_blocks(aux):
        ncq = ncart(aux_blk.la)
        for pblk in pair_blocks:
            if pblk.n == 0:
                continue
            nca, ncb = pblk.nbf_block
            r, c = np.meshgrid(np.arange(pblk.n), np.arange(aux_blk.n), indexing="ij")
            sel_p, sel_q = r.ravel(), c.ravel()
            # bra = orbital pair, ket = (aux, unit)
            vals = eri_block(pblk, aux_blk, sel_p, sel_q, chunk=chunk)
            vals = vals.reshape(-1, nca, ncb, ncq)
            ia, ib = block_scatter_indices(pblk)        # [np, nca, ncb]
            ia, ib = ia[sel_p], ib[sel_p]
            iq = aux_blk.off_a[sel_q][:, None, None, None] + np.arange(ncq)[None, None, None, :]
            iq = np.broadcast_to(iq, vals.shape)
            ia4 = np.broadcast_to(ia[..., None], vals.shape)
            ib4 = np.broadcast_to(ib[..., None], vals.shape)
            out[iq, ia4, ib4] = vals
            off = pblk.ish[sel_p] != pblk.jsh[sel_p]
            if off.any():
                out[iq[off], ib4[off], ia4[off]] = vals[off]
    return out
