"""Conditioning-aware DF metric fold (models/linalg.py::fold_metric).

Regression for the S22 S01/S05/S12 DF failures: generated (AutoAux)
auxiliary sets on nitrogen systems produce numerically singular Coulomb
metrics (S01 ammonia dimer: min eig 5.7e-15, cond 1.5e17), and the plain
Cholesky fold amplified integral noise into deterministic garbage SCF
energies (~-4.6e13) or NaNs.  The fold must detect this and fall back to
the eigenvalue-filtered pseudo-inverse square root (the reference applies
the same canonical-orthogonalization filtering to S, SCF.jl:141-162).
"""

import numpy as np
import pytest

from juliachem_jl_tpu.models.linalg import fold_metric


def test_healthy_metric_matches_cholesky():
    rng = np.random.default_rng(7)
    A = rng.standard_normal((32, 32))
    M = A @ A.T + 32 * np.eye(32)
    B0 = rng.standard_normal((32, 11))
    B = B0.copy()
    fold_metric(M, B)
    ref = np.linalg.solve(np.linalg.cholesky(M), B0)
    assert np.abs(B - ref).max() < 1e-12


def test_f32_b_scaled_fold_hits_storage_floor():
    """f32 B storage folds through the Jacobi-equilibrated f64 path:
    with d_i = ||L[i,:]||, L^{-1}B = Ls^{-1}(D^{-1}B) exactly, and the
    equilibrated operand keeps the error at the f32 OUTPUT quantization
    floor (~6e-8 relative) even for cond ~1e11 metrics — plain f32
    folding loses sqrt(cond)*eps_f32 instead (measured 6.6e-4 Eh on
    4 waters)."""
    from juliachem_jl_tpu.models import linalg as L

    rng = np.random.default_rng(5)
    n = 96
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = np.logspace(-11, 0, n)
    M = (Q * w) @ Q.T
    Lc = np.linalg.cholesky(M)
    B0 = rng.standard_normal((n, 33))
    ref = np.linalg.solve(Lc, B0)  # lower-triangular solve
    for force_device in (False, True):
        old = L._HOST_SOLVE_FLOPS
        if force_device:
            L._HOST_SOLVE_FLOPS = 0
        try:
            out = L.apply_triangular_inverse(Lc, B0.astype(np.float32))
        finally:
            L._HOST_SOLVE_FLOPS = old
        rel = (np.linalg.norm(out.astype(np.float64) - ref)
               / np.linalg.norm(ref))
        assert rel < 5e-7, (force_device, rel)
    # the f64 path is the pre-equilibration algebra (explicit inverse vs
    # solve differ only at f64 roundoff, relative to the solution norm)
    out64 = L.apply_triangular_inverse(Lc, B0.copy())
    assert np.linalg.norm(out64 - ref) / np.linalg.norm(ref) < 1e-12


def test_singular_metric_uses_pseudoinverse():
    rng = np.random.default_rng(11)
    V = rng.standard_normal((31, 31))
    Mh = V @ V.T + 31 * np.eye(31)
    # last auxiliary function exactly duplicates the first -> singular
    M = np.zeros((32, 32))
    M[:31, :31] = Mh
    M[31, :31] = Mh[0]
    M[:31, 31] = Mh[:, 0]
    M[31, 31] = Mh[0, 0]
    P = rng.standard_normal((32, 11))
    P[31] = P[0]  # 3-center rows consistent with the duplication
    B = P.copy()
    with pytest.warns(UserWarning, match="singular"):
        fold_metric(M, B)
    # the physically meaningful object is B^T B = P^T J^+ P
    ref = P.T @ np.linalg.pinv(M, rcond=1e-10) @ P
    assert np.abs(B.T @ B - ref).max() < 1e-10
    # shape preserved (sharded layouts depend on the row count)
    assert B.shape == P.shape


def test_indefinite_metric_no_nan():
    # Cholesky raises on an indefinite matrix (the S05/S12 NaN class);
    # the fold must recover via the eigh route instead of propagating NaNs
    rng = np.random.default_rng(3)
    V = rng.standard_normal((16, 16))
    M = V @ V.T
    M -= 1.0001 * np.linalg.eigvalsh(M)[0] * np.eye(16)  # SPD
    M[0] *= 1e-18  # crush one row -> numerically singular/indefinite
    M[:, 0] *= 1e-18
    B = rng.standard_normal((16, 5))
    with pytest.warns(UserWarning, match="singular"):
        fold_metric(M, B)
    assert np.isfinite(B).all()
