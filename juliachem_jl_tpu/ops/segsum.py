"""Static-pattern segment reduction as gathers (TPU scatter replacement).

XLA's scatter-add on TPU serializes conflicting updates and runs far off the
vector units — it was the bottleneck of the conventional Fock digestion
(round-2: 5.5 s/iter at w8 vs 0.19 s for DF; VERDICT weak #5).  But the
digestion's scatter pattern is *static per geometry* (it comes from the
screened quartet lists), so the reduction can be precomputed on the host as
a two-level padded gather plan and executed per iteration as pure dense
gathers + row sums — bandwidth-bound VPU work instead of serialized scatter.

Level 1: the value stream is grouped by target index into sub-segments of at
most W contributions; G1[n_sub, W] holds stream positions (sentinel = one
zero slot appended to the stream).  Level 2 sums each target's sub-segments:
G2[n_t, W2] indexes the level-1 partial sums.  Both levels are exact
fixed-width f64 reductions (no prefix-sum cancellation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class GatherPlan:
    """Host-precomputed two-level reduction plan for one static index stream.

    m_pad: when the value stream will arrive zero-padded to m_pad (callers
    bucket stream lengths so the jitted reduction shape is shared), the
    sentinel position is m_pad (one past the padded stream, i.e. the zero
    slot the reduction appends)."""

    __slots__ = ("G1", "G2", "targets", "m", "n_out")

    def __init__(self, idx_stream: np.ndarray, n_out: int, W: int = 128,
                 m_pad: int | None = None):
        m = int(idx_stream.size)
        sent = m if m_pad is None else int(m_pad)
        self.m = m
        self.n_out = n_out
        order = np.argsort(idx_stream, kind="stable")
        sorted_ids = idx_stream[order]
        uniq, starts = np.unique(sorted_ids, return_index=True)
        lens = np.diff(np.append(starts, m))
        n_sub_per = -(-lens // W)
        n_sub = int(n_sub_per.sum())

        sub_of = np.repeat(np.arange(len(uniq)), n_sub_per)
        base = np.cumsum(n_sub_per) - n_sub_per
        k_within = np.arange(n_sub) - base[sub_of]
        sub_start = starts[sub_of] + k_within * W
        sub_len = np.minimum(lens[sub_of] - k_within * W, W)
        col = np.arange(W)[None, :]
        mask = col < sub_len[:, None]
        pos = np.minimum(sub_start[:, None] + col, m - 1)
        dt = np.int32 if max(m, sent) < 2**31 - 1 else np.int64
        G1 = np.where(mask, order[pos], sent).astype(dt)

        # W2 rounds up to a power of two: the level-2 width would otherwise
        # vary freely with the densest target's multiplicity, giving every
        # plan its own reduction-kernel shape (one ~30-60 s relay compile
        # each).  Padding columns point at the sentinel (zero) slot.
        W2 = int(n_sub_per.max()) if len(uniq) else 1
        W2 = max(4, 1 << (W2 - 1).bit_length())
        r = np.arange(W2)[None, :]
        G2 = np.where(r < n_sub_per[:, None], base[:, None] + r,
                      n_sub).astype(dt)

        # pad row counts to power-of-two buckets so the jitted reduction
        # kernel shape (and its compilation) is shared across geometries
        def p2(x):
            return max(16, 1 << (int(x) - 1).bit_length())

        n_sub_p = p2(n_sub)
        if n_sub_p != n_sub:
            G1 = np.concatenate(
                [G1, np.full((n_sub_p - n_sub, W), sent, dtype=dt)])
        n_t_p = p2(len(uniq))
        if n_t_p != len(uniq):
            G2 = np.concatenate(
                [G2, np.full((n_t_p - len(uniq), W2), n_sub, dtype=dt)])
            # padded targets point out of bounds -> dropped by mode="drop"
            # (keeps the in-bounds targets unique for the fast scatter path)
            uniq = np.concatenate(
                [uniq, np.full(n_t_p - len(uniq), n_out, dtype=uniq.dtype)])
        self.G1 = jnp.asarray(G1)
        self.G2 = jnp.asarray(G2)
        self.targets = jnp.asarray(uniq.astype(dt))


@partial(jax.jit, donate_argnums=(0,))
def _reduce_into(acc, vals, G1, G2, targets):
    """acc[n_out] += segment sums of vals by the plan."""
    vz = jnp.concatenate([vals.reshape(-1), jnp.zeros(1, vals.dtype)])
    s1 = vz[G1].sum(axis=1)
    s1z = jnp.concatenate([s1, jnp.zeros(1, vals.dtype)])
    s2 = s1z[G2].sum(axis=1)
    return acc.at[targets].add(s2, mode="drop", unique_indices=True)


def reduce_into(plan: GatherPlan, acc, vals):
    """acc (shape [n_out]) += plan-reduced vals (padded targets dropped)."""
    return _reduce_into(acc, vals, plan.G1, plan.G2, plan.targets)
