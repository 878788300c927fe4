"""Mesh-sharded spin-resolved DF J/K builder: multi-chip UHF/ROHF.

Extends the production sharded DF path (df_sharded.py — per-device packed
Q rows of B, one shard_map Fock, psum reductions) to the open-shell
two_electron_jk interface used by models/uhf.py and models/rohf.py.  The
reference framework has no open-shell SCF; this is the mesh-scale variant
of models/df_screened_jk.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.timings import JCTC, Timings
from .df_sharded import ShardedDFFockBuilder


class ShardedDFJKBuilder(ShardedDFFockBuilder):
    """ShardedDFFockBuilder plus two_electron_jk over the mesh."""

    def __init__(self, primary, auxiliary, opts=None,
                 timings: Timings | None = None):
        super().__init__(primary, auxiliary, opts, timings=timings)
        from ..parallel.shard_jk import make_packed_jk_step

        self._jk = make_packed_jk_step(
            self.mesh, self.B.shape[0], self.screen.npq + 1, self.nbf,
            self._q_chunk, self._n_chunks)

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
        # factor-1 density through the parent's sqrt(0.5|w|) eigenfactor
        return self._signed_factor(2.0 * np.asarray(D))

    def two_electron_jk(self, Da, Db, iteration, timings: Timings,
                        Ca=None, Cb=None):
        d = jnp.concatenate([
            jnp.asarray(np.asarray(Da) + np.asarray(Db)).reshape(-1)[
                self._pq_flat], jnp.zeros(1)])
        Cs_a, s_a = self._spin_factor(Da, Ca)
        Cs_b, s_b = self._spin_factor(Db, Cb)
        with timings.timed(JCTC.fock_time + "_device", iteration):
            J, Ka, Kb = self._jk(self.B, d, Cs_a, s_a, Cs_b, s_b,
                                 self._col_map, self._pq_flat)
        return np.asarray(J), np.asarray(Ka), np.asarray(Kb)
