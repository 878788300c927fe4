"""Quartet-sharded conventional (direct-SCF) Fock build over the device mesh.

The reference parallelizes the conventional Fock build by walking the
composite triangular shell-quartet index space in strided batches across
MPI ranks x threads (SCF.jl:683-744, Indicies.jl:5-7) and Allreducing the
per-rank skeleton Fock (SCF.jl:623).  The TPU-native equivalent: the
Schwarz-screened symmetry-unique quartet batches (ops/fock.py) are padded
and sharded over the flattened device mesh on the quartet axis; every device
runs the same class kernel + digestion on its quartet shard, accumulating a
device-local J/K workspace, and one reduction over the mesh at the end of
the iteration replaces MPI.Allreduce.

Static SPMD sharding replaces the reference's dynamic coordinator-worker
scheduler (its own default is static, Constants.jl:54); load balance comes
from splitting each class batch evenly across devices rather than from
work stealing.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.scf import FockBuilder
from ..utils.timings import JCTC, Timings
from .eri import _eri_kernel_body
from .fock import DEFAULT_CUTOFF, QuartetBatch, _make_digest_body, build_quartet_batches

AXES = ("q", "k")


@lru_cache(maxsize=None)
def _sharded_class_step(key: tuple, nbf: int, mesh: Mesh):
    """Jitted shard_map'd step for one quartet class: each device computes
    the ERI blocks of its quartet shard and digests them into its local
    J/K workspace row (no cross-device communication inside the step)."""
    la, lb, lc, ld = key[:4]
    eri_f = _eri_kernel_body(*key)
    digest_f = _make_digest_body(la, lb, lc, ld, nbf)

    def local(J, K, D, w, aexp, bexp, acoef, bcoef, A, B,
              cexp, dexp, ccoef, dcoef, C, Dc,
              iab, icd, iac, iad, ibc, ibd):
        I = eri_f(aexp, bexp, acoef, bcoef, A, B,
                  cexp, dexp, ccoef, dcoef, C, Dc)
        Jl, Kl = digest_f(J[0], K[0], I, w, D, iab, icd, iac, iad, ibc, ibd)
        return Jl[None], Kl[None]

    qspec = P(AXES)
    step = shard_map(
        local,
        mesh=mesh,
        in_specs=(qspec, qspec, P()) + (qspec,) * 19,
        out_specs=(qspec, qspec),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0, 1))


class ShardedDirectFock(FockBuilder):
    """Multi-device screened direct Fock (the §2.3 'rank-parallel
    conventional Fock' analog: quartet sharding over the mesh)."""

    def __init__(self, basis, mesh: Mesh | None = None,
                 n_devices: int | None = None,
                 cutoff: float = DEFAULT_CUTOFF, chunk: int = 2048,
                 timings: Timings | None = None):
        if mesh is None:
            from ..parallel.mesh import make_mesh

            mesh = make_mesh(n_devices)
        self.mesh = mesh
        self.ndev = int(mesh.devices.size)
        self.basis = basis
        self.nbf = basis.nbf
        # bucket nbf so digestion kernels are shared across molecules
        # (see build_quartet_batches)
        self.nbf_pad = -(-basis.nbf // 128) * 128
        self.chunk = chunk
        self.batches, self.Q = build_quartet_batches(
            basis, cutoff, nbf_pad=self.nbf_pad)
        self._ws_sharding = NamedSharding(mesh, P(AXES))
        self._qspec = NamedSharding(mesh, P(AXES))
        self._chunks: list[tuple] | None = None
        if timings is not None:
            timings.non_timing_data[JCTC.gpu_num_devices] = str(self.ndev)

    # ---------------------------------------------------------- host prep

    def _prep(self) -> list[tuple]:
        """Pad + shard every class batch once; density-independent, reused
        every iteration (the quartet lists are static per geometry)."""
        chunks = []
        ndev = self.ndev
        for b in self.batches:
            key = (b.bra.la, b.bra.lb, b.ket.la, b.ket.lb,
                   b.bra.aexp.shape[1], b.bra.bexp.shape[1],
                   b.ket.aexp.shape[1], b.ket.bexp.shape[1])
            n = len(b.sel_bra)
            cs = min(self.chunk, -(-n // ndev))
            stride = ndev * cs
            n_pad = -(-n // stride) * stride

            sb, sk = b.sel_bra, b.sel_ket
            w = b.weight
            arrays = [
                w,
                b.bra.aexp[sb], b.bra.bexp[sb], b.bra.acoef[sb],
                b.bra.bcoef[sb], b.bra.A[sb], b.bra.B[sb],
                b.ket.aexp[sk], b.ket.bexp[sk], b.ket.acoef[sk],
                b.ket.bcoef[sk], b.ket.A[sk], b.ket.B[sk],
                b.idx_ab, b.idx_cd, b.idx_ac, b.idx_ad, b.idx_bc, b.idx_bd,
            ]
            padded = []
            for x in arrays:
                if n_pad != n:
                    fill = np.repeat(x[:1], n_pad - n, axis=0)
                    if x is arrays[0]:  # weights: pads contribute nothing
                        fill = np.zeros(n_pad - n)
                    x = np.concatenate([x, fill], axis=0)
                padded.append(x)
            for s in range(0, n_pad, stride):
                # interleave so each device's rows come from one contiguous
                # slice: [stride] -> [ndev, cs] row-major
                sharded = tuple(
                    jax.device_put(x[s:s + stride], self._qspec)
                    for x in padded
                )
                chunks.append((key, sharded))
        return chunks

    # ---------------------------------------------------------- iteration

    def two_electron_fock(self, D, iteration, timings: Timings, C_occ=None):
        nbf, nbf_pad = self.nbf, self.nbf_pad
        if self._chunks is None:
            self._chunks = self._prep()
        D = jnp.asarray(D)
        if nbf_pad != nbf:
            D = jnp.pad(D, ((0, nbf_pad - nbf), (0, nbf_pad - nbf)))
        D = jax.device_put(D, NamedSharding(self.mesh, P(None, None)))
        J_ws = jax.device_put(jnp.zeros((self.ndev, nbf_pad * nbf_pad)),
                              self._ws_sharding)
        K_ws = jax.device_put(jnp.zeros((self.ndev, nbf_pad * nbf_pad)),
                              self._ws_sharding)
        for key, arrs in self._chunks:
            step = _sharded_class_step(key, nbf_pad, self.mesh)
            J_ws, K_ws = step(J_ws, K_ws, D, *arrs)
        # one cross-device reduction per iteration (MPI.Allreduce analog)
        J = J_ws.sum(axis=0).reshape(nbf_pad, nbf_pad)[:nbf, :nbf]
        K = K_ws.sum(axis=0).reshape(nbf_pad, nbf_pad)[:nbf, :nbf]
        J = J + J.T
        K = K + K.T
        return np.asarray(J - 0.5 * K)

    def finalize(self):
        self._chunks = None
