"""First-derivative 4-center ERIs and the two-electron RHF gradient term.

This EXCEEDS the reference: JuliaChem scaffolds gradients but disables them
("does not yet support RHF gradients", src/rhf/gradient/Gradient.jl:31-32).
Built on the same class-batched McMurchie-Davidson factorization as
ops/eri.py, using the derivative identity applied inside the contraction
(ops/oei_grad.py pattern):

    d/dAx (ab|cd) = 2a (a+1x,b|cd) - ax (a-1x,b|cd)

which is exact for the contracted integral (the dependence of P on A is
carried by the identity).  Differentiating a bra component raises the
Hermite order by one, so the R tensor runs to L+1 and the bra combination
table is combine_tables(L_bra+1, L_ket); mutatis mutandis for B and C.
The fourth center comes from translational invariance:
dD = -(dA + dB + dC).

The energy contraction uses the permutation-symmetrized two-particle density

    G~_mnls = 1/2 D_mn D_ls - 1/8 (D_ml D_ns + D_ms D_nl)

(the symmetrization of the closed-shell Gamma over the integral's m<->n,
l<->s symmetry), so unique shell pairs on each side with weight
(2 - delta_mn)(2 - delta_ls) cover the full four-index sum.

Host (numpy) evaluation like the other one-shot setup kernels: the MD
recurrences are xp-generic, and a gradient is computed once per geometry —
compilation (~40 s/class on this host or through the TPU relay) would
dominate any device win at the system sizes gradients are run at today.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..basis.structs import Basis, axial_normalization, ncart
from .boys import boys_np
from .class_tables import combine_tables, herm_list
from .eri import TWO_PI_POW_2_5
from .mcmurchie import e_dense, pair_primitive_data
from .mcmurchie import r_tensor
from .oei_grad import _component_tables, _expansion
from .pairs import unique_pair_blocks
from .schwarz import pair_schwarz

_CHUNK = 256


@lru_cache(maxsize=None)
def _eri_grad_kernel(la, lb, lc, ld):
    """Host kernel: per-quartet derivative blocks (dA, dB, dC), each
    [N, 3, nab, ncd].  dD = -(dA + dB + dC) is left to the caller."""
    Lb, Lk = la + lb, lc + ld
    L = Lb + Lk
    nab = ncart(la) * ncart(lb)
    ncd = ncart(lc) * ncart(ld)

    ia_t, ib_t = _component_tables(la, lb)
    ic_t, id_t = _component_tables(lc, ld)
    ax_b = np.outer(axial_normalization(la), axial_normalization(lb)).reshape(-1)
    ax_k = np.outer(axial_normalization(lc), axial_normalization(ld)).reshape(-1)
    hl_b0, hl_b1 = herm_list(Lb), herm_list(Lb + 1)
    hl_k0, hl_k1 = herm_list(Lk), herm_list(Lk + 1)
    comb_bra, sign_bra = combine_tables(Lb + 1, Lk)   # bra-side derivative
    comb_ket, sign_ket = combine_tables(Lb, Lk + 1)   # ket-side derivative

    def fold(Eexp, ax, cc):
        # [N,K2,na,nb,nh] -> [N,K2,na*nb,nh] with axial norms + coefficients
        N, K2 = Eexp.shape[:2]
        out = Eexp.reshape(N, K2, -1, Eexp.shape[-1])
        return out * ax[None, None, :, None] * cc[:, :, None, None]

    def f(aexp, bexp, acoef, bcoef, A, B, cexp, dexp, ccoef, dcoef, C, D):
        prim_b = pair_primitive_data(aexp, bexp, acoef, bcoef, A, B)
        prim_k = pair_primitive_data(cexp, dexp, ccoef, dcoef, C, D)
        Eb = e_dense(la + 1, lb + 1, prim_b)
        Ek = e_dense(lc + 1, ld + 1, prim_k)
        p, q = prim_b["p"], prim_k["p"]
        cc_b, cc_k = prim_b["cc"], prim_k["cc"]

        PQ = prim_b["P"][:, :, None, :] - prim_k["P"][:, None, :, :]
        psum = p[:, :, None] + q[:, None, :]
        alpha = p[:, :, None] * q[:, None, :] / psum
        Targ = alpha * np.sum(PQ**2, axis=-1)
        pref = TWO_PI_POW_2_5 / (p[:, :, None] * q[:, None, :] * np.sqrt(psum))
        F = boys_np(Targ, L + 1) * pref[..., None]
        R = r_tensor(L + 1, alpha, PQ, F)             # [N,K2b,K2k,nherm(L+1)]

        # ---- bra-center derivatives (A, B) -------------------------------
        M1 = R[..., comb_bra] * sign_bra[None, None, None, None, :]
        Ecd0 = fold(_expansion(Ek, ic_t, id_t, hl_k0), ax_k, cc_k)
        T1 = np.einsum("nqkhg,nkcg->nqhc", M1, Ecd0)  # [N,K2b,nhb1,ncd]

        a2 = (2.0 * prim_b["a"])[:, :, None, None, None]
        b2 = (2.0 * prim_b["b"])[:, :, None, None, None]
        dA = np.empty((Targ.shape[0], 3, nab, ncd))
        dB = np.empty_like(dA)
        for d in range(3):
            iw = np.asarray(ia_t[d], dtype=Eb.dtype)[None, None, :, :, None]
            jw = np.asarray(ib_t[d], dtype=Eb.dtype)[None, None, :, :, None]
            dE_A = fold(
                a2 * _expansion(Eb, ia_t, ib_t, hl_b1, d, +1, "bra")
                - iw * _expansion(Eb, ia_t, ib_t, hl_b1, d, -1, "bra"),
                ax_b, cc_b)
            dE_B = fold(
                b2 * _expansion(Eb, ia_t, ib_t, hl_b1, d, +1, "ket")
                - jw * _expansion(Eb, ia_t, ib_t, hl_b1, d, -1, "ket"),
                ax_b, cc_b)
            dA[:, d] = np.einsum("nqah,nqhc->nac", dE_A, T1)
            dB[:, d] = np.einsum("nqah,nqhc->nac", dE_B, T1)

        # ---- ket-center derivative (C) -----------------------------------
        M2 = R[..., comb_ket] * sign_ket[None, None, None, None, :]
        Eab0 = fold(_expansion(Eb, ia_t, ib_t, hl_b0), ax_b, cc_b)
        S = np.einsum("nqah,nqkhg->nkag", Eab0, M2)   # [N,K2k,nab,nhk1]

        c2 = (2.0 * prim_k["a"])[:, :, None, None, None]
        dC = np.empty_like(dA)
        for d in range(3):
            kw = np.asarray(ic_t[d], dtype=Ek.dtype)[None, None, :, :, None]
            dE_C = fold(
                c2 * _expansion(Ek, ic_t, id_t, hl_k1, d, +1, "bra")
                - kw * _expansion(Ek, ic_t, id_t, hl_k1, d, -1, "bra"),
                ax_k, cc_k)
            dC[:, d] = np.einsum("nkag,nkcg->nac", S, dE_C)

        return dA, dB, dC

    return f


def two_electron_gradient(basis: Basis, mol, D: np.ndarray,
                          cutoff: float = 1.0e-11) -> np.ndarray:
    """dE_2e/dR [natom, 3]: Schwarz-screened contraction of the derivative
    quartet blocks with the symmetrized two-particle density G~ (docstring).

    Iterates every ordered pair of unique shell-pair blocks (both (P,Q) and
    (Q,P)), so each side only needs its own pair weight (2 - delta)."""
    natom = mol.natom
    grad = np.zeros((natom, 3))
    blocks = unique_pair_blocks(basis)
    bounds = [pair_schwarz(blk) for blk in blocks]
    d_scale = max(float(np.abs(D).max()), 1e-30) ** 2
    atom_of = basis.shell_atom

    for bi, bra in enumerate(blocks):
        nca, ncb = bra.nbf_block
        w_bra = np.where(bra.ish != bra.jsh, 2.0, 1.0)
        for bj, ket in enumerate(blocks):
            ncc, ncd_ = ket.nbf_block
            bound = bounds[bi][:, None] * bounds[bj][None, :]
            ii, jj = np.nonzero(bound * d_scale > cutoff)
            if len(ii) == 0:
                continue
            kern = _eri_grad_kernel(bra.la, bra.lb, ket.la, ket.lb)
            w_ket = np.where(ket.ish != ket.jsh, 2.0, 1.0)
            for s in range(0, len(ii), _CHUNK):
                ib, ik = ii[s:s + _CHUNK], jj[s:s + _CHUNK]
                dA, dB, dC = kern(
                    bra.aexp[ib], bra.bexp[ib], bra.acoef[ib], bra.bcoef[ib],
                    bra.A[ib], bra.B[ib],
                    ket.aexp[ik], ket.bexp[ik], ket.acoef[ik], ket.bcoef[ik],
                    ket.A[ik], ket.B[ik],
                )
                n = len(ib)
                oa = bra.off_a[ib][:, None] + np.arange(nca)[None, :]
                ob = bra.off_b[ib][:, None] + np.arange(ncb)[None, :]
                oc = ket.off_a[ik][:, None] + np.arange(ncc)[None, :]
                od = ket.off_b[ik][:, None] + np.arange(ncd_)[None, :]
                D_mn = D[oa[:, :, None], ob[:, None, :]].reshape(n, -1)
                D_ls = D[oc[:, :, None], od[:, None, :]].reshape(n, -1)
                D_ml = D[oa[:, :, None, None, None],
                         oc[:, None, None, :, None]]          # [n,a,1,c,1]
                D_ns = D[ob[:, None, :, None, None],
                         od[:, None, None, None, :]]          # [n,1,b,1,d]
                D_ms = D[oa[:, :, None, None, None],
                         od[:, None, None, None, :]]          # [n,a,1,1,d]
                D_nl = D[ob[:, None, :, None, None],
                         oc[:, None, None, :, None]]          # [n,1,b,c,1]
                gam = (0.5 * D_mn[:, :, None] * D_ls[:, None, :]
                       - 0.125 * ((D_ml * D_ns) + (D_ms * D_nl)).reshape(
                           n, nca * ncb, ncc * ncd_))
                w = (w_bra[ib] * w_ket[ik])[:, None]
                fA = w * np.einsum("nac,ndac->nd", gam, dA)
                fB = w * np.einsum("nac,ndac->nd", gam, dB)
                fC = w * np.einsum("nac,ndac->nd", gam, dC)
                fD = -(fA + fB + fC)
                np.add.at(grad, atom_of[bra.ish[ib]], fA)
                np.add.at(grad, atom_of[bra.jsh[ib]], fB)
                np.add.at(grad, atom_of[ket.ish[ik]], fC)
                np.add.at(grad, atom_of[ket.jsh[ik]], fD)
    return grad
