"""Spin-resolved J/K on the packed screened-DF path (UHF/ROHF at scale).

The closed-shell ScreenedDFFockBuilder (df_screened.py) fuses J - 0.5 K
into one pass over the packed Q-blocked B; open-shell SCF needs the
pieces separately per spin: (J(Da+Db), K(Da), K(Db)).  This builder
reuses the exact same packed tiles and kernels — one pass accumulates
J (from the total density's packed vector) together with K(Da), a second
pass accumulates K(Db) — so UHF/ROHF inherit the screened path's memory
behavior (packed pq columns, Q-blocked exchange, host-streamed f64 B).

The reference has no open-shell SCF at all (SCF.jl is RHF-only); its
ScreenedDF.jl machinery (sparse-pq B, blocked exchange) is what the
closed-shell parent mirrors — this module extends that surface to the
spin-resolved interface used by models/uhf.py and models/rohf.py.

Factor conventions: uhf.py passes factor-1 spin densities (Da = Ca Ca^T).
The parent's kernels build K(Cocc Cocc^T) from explicit orbitals, which is
exactly K(Da); the eigenfactor fallback (no orbitals yet, e.g. a SAD first
iteration) uses _signed_factor(2 Da), whose sqrt(0.5 |w|) scaling then
yields K(Da) as well.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.timings import JCTC, Timings
from .df_screened import (
    ScreenedDFFockBuilder,
    _finalize_G,
    _finalize_G_blocked,
    _jk_chunk_lower_fused,
    _jk_chunk_signed_fused,
)

__all__ = ["ScreenedDFJKBuilder"]


class ScreenedDFJKBuilder(ScreenedDFFockBuilder):
    """ScreenedDFFockBuilder plus the spin-resolved two_electron_jk."""

    def _k_pass(self, d, Cs, s, dt: str):
        """One sweep over the packed B blocks: returns (K, Jp) where K is
        the full exchange of the density factored by (Cs, s) and Jp the
        packed Coulomb vector of d (pass d=0 to skip J work)."""
        nbf = self.nbf
        fdt = jnp.float32 if dt == "f32" else jnp.float64
        Cs, s, d = Cs.astype(fdt), s.astype(fdt), d.astype(fdt)
        Jp = jnp.zeros(self.screen.npq + 1, dtype=fdt)
        nb = self.k_blocks
        if nb > 1:
            kb = -(-nbf // nb)
            Kup = jnp.zeros((nb * kb, nb * kb), dtype=fdt)
            for blk in self._iter_blocks(dt):
                Kup, Jp = _jk_chunk_lower_fused(
                    Kup, Jp, blk, d, self._col_map, Cs, s, nb)
            # mirror the upper block triangle exactly as _finalize_G_blocked
            idx = jnp.arange(Kup.shape[0]) // kb
            bd = idx[:, None] == idx[None, :]
            K = (Kup + Kup.T - jnp.where(bd, Kup, 0.0))[:nbf, :nbf]
        else:
            K = jnp.zeros((nbf, nbf), dtype=fdt)
            for blk in self._iter_blocks(dt):
                K, Jp = _jk_chunk_signed_fused(
                    K, Jp, blk, d, self._col_map, Cs, s)
        return K.astype(jnp.float64), Jp.astype(jnp.float64)

    def _spin_factor(self, D, C_occ):
        if C_occ is not None and C_occ.shape[1] > 0:
            k = C_occ.shape[1]
            kp = -(-k // 32) * 32
            Cs = np.asarray(C_occ, dtype=np.float64)
            s = np.ones(kp)
            if kp != k:
                Cs = np.pad(Cs, ((0, 0), (0, kp - k)))
                s[k:] = 0.0
            return jnp.asarray(Cs), jnp.asarray(s)
        # no orbitals yet (SAD first iteration): eigenfactor of 2 D so the
        # parent's sqrt(0.5 |w|) scaling lands on K(D) for a factor-1 D
        return self._signed_factor(2.0 * np.asarray(D))

    def two_electron_jk(self, Da, Db, iteration, timings: Timings,
                        Ca=None, Cb=None):
        dt = "f64"
        d = jnp.concatenate(
            [self._gather_d(np.asarray(Da) + np.asarray(Db)), jnp.zeros(1)])
        Cs_a, s_a = self._spin_factor(Da, Ca)
        Cs_b, s_b = self._spin_factor(Db, Cb)
        with timings.timed(JCTC.K_time, iteration):
            Ka, Jp = self._k_pass(d, Cs_a, s_a, dt)
            Kb, _ = self._k_pass(jnp.zeros_like(d), Cs_b, s_b, dt)
            Kb.block_until_ready()
        with timings.timed(JCTC.J_time, iteration):
            nbf = self.nbf
            J = jnp.zeros(nbf * nbf).at[self._pq_flat].set(
                Jp[:-1]).reshape(nbf, nbf)
        return np.asarray(J), np.asarray(Ka), np.asarray(Kb)
