"""One-electron integrals: overlap, kinetic, nuclear attraction, dipole.

TPU-native replacement for the reference's OEIEngine
(deps/src/jeri-oei.hpp:30-159) and the shell-pair assembly loops in
src/rhf/energy/EnergyHelpers.jl:25-140: instead of one libint call per shell
pair, every angular-momentum class pair is evaluated as one batched
McMurchie-Davidson tensor program.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..basis.structs import Basis, axial_normalization
from .boys import boys
from .class_tables import pair_tables
from .mcmurchie import e_dense, hermite_expansion, pair_primitive_data, r_tensor
from .pairs import PairBlock, block_scatter_indices, unique_pair_blocks

_CHUNK = 4096


def _gather_1d(E, tab, j_shift: int = 0):
    """Per-dimension E(i,j,0) tables gathered to component-pair shape.

    E: [N,K2,3,la+1,lbx+1,L+1]; returns (ex, ey, ez) each [N,K2,nca,ncb]
    evaluated at (i_a, i_b + j_shift, t=0).
    """
    ex = E[:, :, 0, tab["ix_a"], tab["ix_b"] + j_shift, 0]
    ey = E[:, :, 1, tab["iy_a"], tab["iy_b"] + j_shift, 0]
    ez = E[:, :, 2, tab["iz_a"], tab["iz_b"] + j_shift, 0]
    return ex, ey, ez


@lru_cache(maxsize=None)
def _stv_kernel(la: int, lb: int, Ka: int, Kb: int, natom: int):
    """Jitted kernel computing overlap/kinetic/nuclear blocks for one class."""
    tab = pair_tables(la, lb)
    nca, ncb, nh, L = tab["nca"], tab["ncb"], tab["nh"], tab["L"]
    ax = np.outer(axial_normalization(la), axial_normalization(lb))

    def f(aexp, bexp, acoef, bcoef, A, B, coords, Z):
        prim = pair_primitive_data(aexp, bexp, acoef, bcoef, A, B)
        p, b, cc = prim["p"], prim["b"], prim["cc"]
        pref = (jnp.pi / p) ** 1.5 * cc                         # [N,K2]

        # E with ket angular momentum extended by 2 (for kinetic)
        E = e_dense(la, lb + 2, prim)
        ex0, ey0, ez0 = _gather_1d(E, tab, 0)
        ex2, ey2, ez2 = _gather_1d(E, tab, 2)

        jb = jnp.asarray(
            np.stack([tab["ix_b"], tab["iy_b"], tab["iz_b"]]), dtype=E.dtype
        )  # [3, nca, ncb]
        b4 = b[:, :, None, None]

        def k1d(e0, e2, j, i_a, i_b, d):
            # K(i,j) = -2 b^2 E(i,j+2) + b(2j+1) E(i,j) - j(j-1)/2 E(i,j-2)
            low = E[:, :, d, i_a, np.maximum(i_b - 2, 0), 0]
            jj = j[None, None]
            return (
                -2.0 * b4**2 * e2
                + b4 * (2.0 * jj + 1.0) * e0
                - 0.5 * jj * (jj - 1.0) * jnp.where(jj >= 2, low, 0.0)
            )

        kx = k1d(ex0, ex2, jb[0], tab["ix_a"], tab["ix_b"], 0)
        ky = k1d(ey0, ey2, jb[1], tab["iy_a"], tab["iy_b"], 1)
        kz = k1d(ez0, ez2, jb[2], tab["iz_a"], tab["iz_b"], 2)

        s3 = ex0 * ey0 * ez0
        t3 = kx * ey0 * ez0 + ex0 * ky * ez0 + ex0 * ey0 * kz
        S = jnp.einsum("nk,nkab->nab", pref, s3)
        T = jnp.einsum("nk,nkab->nab", pref, t3)

        # nuclear attraction
        Eab = hermite_expansion(la, lb, prim)                   # [N,K2,nab,nh]
        PC = prim["P"][:, :, None, :] - coords[None, None, :, :]
        Targ = p[:, :, None] * jnp.sum(PC**2, axis=-1)          # [N,K2,natom]
        F = boys(Targ, L)
        F = F * (-(2.0 * jnp.pi / p))[:, :, None, None] * Z[None, None, :, None]
        alpha = jnp.broadcast_to(p[:, :, None], Targ.shape)
        R = r_tensor(L, alpha, PC, F)                           # [N,K2,natom,nh]
        Rsum = R.sum(axis=2)
        V = jnp.einsum("nkah,nkh->na", Eab, Rsum).reshape(-1, nca, ncb)

        axj = jnp.asarray(ax)
        return S * axj, T * axj, V  # V already axial-normalized via Eab

    return jax.jit(f)


@lru_cache(maxsize=None)
def _dipole_kernel(la: int, lb: int, Ka: int, Kb: int):
    """Jitted kernel for dipole-moment integral blocks <a| r_d - C_d |b>."""
    tab = pair_tables(la, lb)
    ax = np.outer(axial_normalization(la), axial_normalization(lb))

    def f(aexp, bexp, acoef, bcoef, A, B, origin):
        prim = pair_primitive_data(aexp, bexp, acoef, bcoef, A, B)
        p, cc = prim["p"], prim["cc"]
        pref = (jnp.pi / p) ** 1.5 * cc
        E = e_dense(la, lb + 1, prim)
        ex0, ey0, ez0 = _gather_1d(E, tab, 0)
        ex1, ey1, ez1 = _gather_1d(E, tab, 1)
        BC = B - origin[None, :]                                # [N,3]
        bc = BC[:, None, None, None, :]
        mx = ex1 + bc[..., 0] * ex0
        my = ey1 + bc[..., 1] * ey0
        mz = ez1 + bc[..., 2] * ez0
        dip = jnp.stack(
            [mx * ey0 * ez0, ex0 * my * ez0, ex0 * ey0 * mz], axis=-1
        )                                                       # [N,K2,a,b,3]
        out = jnp.einsum("nk,nkabd->nabd", pref, dip)
        return out * jnp.asarray(ax)[None, :, :, None]

    return jax.jit(f)


def _chunked(kernel, arrays, n, extra=(), chunk=_CHUNK):
    """Apply a jitted kernel over [N,...] arrays in fixed-size chunks (last
    chunk padded by repeating row 0) to bound compile count to one shape."""
    outs = None
    chunk = min(chunk, max(n, 1))
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        sl = []
        for x in arrays:
            part = x[s:e]
            if e - s < chunk:
                pad = np.repeat(part[:1], chunk - (e - s), axis=0)
                part = np.concatenate([part, pad], axis=0)
            sl.append(jnp.asarray(part))
        res = kernel(*sl, *extra)
        res = res if isinstance(res, tuple) else (res,)
        res = tuple(np.asarray(r)[: e - s] for r in res)
        if outs is None:
            outs = [[r] for r in res]
        else:
            for o, r in zip(outs, res):
                o.append(r)
    return tuple(np.concatenate(o, axis=0) for o in outs)


def _scatter_sym(M: np.ndarray, block: PairBlock, vals: np.ndarray) -> None:
    """Scatter pair-block values into a symmetric matrix (both triangles)."""
    ia, ib = block_scatter_indices(block)
    np.add.at(M, (ia, ib), vals)
    off = block.ish != block.jsh
    if off.any():
        np.add.at(M, (ib[off].transpose(0, 2, 1), ia[off].transpose(0, 2, 1)),
                  vals[off].transpose(0, 2, 1))


def overlap_kinetic_nuclear(basis: Basis, mol):
    """Full S, T, V matrices (numpy, f64).

    Replaces EnergyHelpers.compute_overlap/ke/nah (EnergyHelpers.jl:25-140).
    """
    nbf = basis.nbf
    S = np.zeros((nbf, nbf))
    T = np.zeros((nbf, nbf))
    V = np.zeros((nbf, nbf))
    # pad the atom axis to a bucket so the nuclear-attraction kernel shape
    # (and hence its compilation) is shared across similar system sizes;
    # padded atoms have Z=0 and contribute exactly zero
    natom_pad = max(8, 1 << (mol.natom - 1).bit_length())
    coords_p = np.zeros((natom_pad, 3))
    coords_p[: mol.natom] = mol.coords
    Z_p = np.zeros(natom_pad)
    Z_p[: mol.natom] = mol.z
    coords = jnp.asarray(coords_p)
    Z = jnp.asarray(Z_p)
    for blk in unique_pair_blocks(basis):
        kern = _stv_kernel(blk.la, blk.lb, blk.aexp.shape[1], blk.bexp.shape[1],
                           natom_pad)
        s, t, v = _chunked(
            kern, (blk.aexp, blk.bexp, blk.acoef, blk.bcoef, blk.A, blk.B),
            blk.n, extra=(coords, Z),
        )
        _scatter_sym(S, blk, s)
        _scatter_sym(T, blk, t)
        _scatter_sym(V, blk, v)
    return S, T, V


def dipole_matrices(basis: Basis, origin=None):
    """<mu| r - origin |nu> for x,y,z; replaces PropEngine dipole blocks
    (deps/src/jeri-prop.hpp:43-53)."""
    nbf = basis.nbf
    out = np.zeros((nbf, nbf, 3))
    origin = np.zeros(3) if origin is None else np.asarray(origin)
    o = jnp.asarray(origin)
    for blk in unique_pair_blocks(basis):
        kern = _dipole_kernel(blk.la, blk.lb, blk.aexp.shape[1], blk.bexp.shape[1])
        (d,) = _chunked(
            kern, (blk.aexp, blk.bexp, blk.acoef, blk.bcoef, blk.A, blk.B),
            blk.n, extra=(o,),
        )
        ia, ib = block_scatter_indices(blk)
        np.add.at(out, (ia, ib), d)
        off = blk.ish != blk.jsh
        if off.any():
            np.add.at(out, (ib[off].transpose(0, 2, 1), ia[off].transpose(0, 2, 1)),
                      d[off].transpose(0, 2, 1, 3))
    return out[..., 0], out[..., 1], out[..., 2]
