"""ROHF energy driver — restricted open-shell Hartree-Fock.

EXCEEDS the reference (RHF-only, src/rhf/energy/SCF.jl:69).  One set of
spatial orbitals: nb doubly-occupied, (na-nb) singly-occupied.  The spin
Fock matrices come from the same spin-resolved builder interface as UHF
(``two_electron_jk``), coupled through the Guest-Saunders effective Fock

    R_mo =  [ (Fa+Fb)/2   Fb          (Fa+Fb)/2 ]   closed
            [ Fb          (Fa+Fb)/2   Fa        ]   open
            [ (Fa+Fb)/2   Fa          (Fa+Fb)/2 ]   virtual

assembled in the current MO basis and diagonalized there (the MO basis is
S-orthonormal, so the rotation applies directly to C).  <S^2> is exactly
s(s+1) by construction — no spin contamination, the usual reason to prefer
ROHF over UHF for radicals.
"""

from __future__ import annotations

import time

import numpy as np

from ..utils import constants as C
from ..utils.options import create_scf_options
from ..utils.timings import JCTC, Timings
from ..ops.oei import overlap_kinetic_nuclear
from . import linalg
from .uhf import _make_jk_builder, _occupations


def energy(mol, basis_sets, scf_flags: dict | None = None,
           output: int = 0) -> dict:
    """Compute the ROHF (or DF-ROHF) energy.  Keywords as rhf.energy plus
    ``multiplicity``."""
    t0 = time.perf_counter()
    scf_flags = dict(scf_flags or {})
    multiplicity = int(scf_flags.pop(
        "multiplicity", getattr(mol, "multiplicity", 1)))
    opts = create_scf_options(scf_flags)
    timings = Timings()
    timings.set_user_options(scf_flags)
    timings.set_options(opts)

    primary = basis_sets.primary
    timings.set_basis_info(
        primary.nbf, primary.nels,
        basis_sets.auxiliary.nbf if basis_sets.auxiliary is not None else None)

    e_nuc = mol.nuclear_repulsion()
    na, nb = _occupations(primary.nels, multiplicity)

    with timings.timed(JCTC.H_time):
        S, T, V = overlap_kinetic_nuclear(primary, mol)
    H = T + V
    sph_T = None
    if getattr(basis_sets, "spherical", False):
        from ..basis.spherical import cart_to_sph_basis
        from .scf import SphericalFockAdapter

        sph_T = cart_to_sph_basis(primary)
        H = sph_T.T @ H @ sph_T
        S = sph_T.T @ S @ sph_T
    X = linalg.orthogonalizer(S)

    use_df = opts.scf_type == C.SCFType.density_fitting
    builder = _make_jk_builder(basis_sets, opts, use_df, timings)
    if sph_T is not None:
        builder = SphericalFockAdapter(builder, sph_T)

    # initial orbitals from the core Hamiltonian (single shared set)
    with timings.timed(JCTC.guess_time):
        eps, Cmo = _diag_in_x(H, X)

    diis = linalg.DIIS(max_vec=opts.ndiis)
    E_old = 0.0
    D_old = None
    R_old = None
    last_dE = 1.0e9
    converged = False
    it = 0
    Fa = Fb = None

    if output >= 2:
        print(f"{'iter':>4s} {'E total':>20s} {'dE':>12s} {'D rms':>12s} "
              f"{'t (s)':>8s}")

    for it in range(1, opts.max_iterations + 1):
        t_it = time.perf_counter()
        Ca = Cmo[:, :na]
        Cb = Cmo[:, :nb]
        Da = Ca @ Ca.T
        Db = Cb @ Cb.T

        with timings.timed(JCTC.fock_time, it):
            J, Ka, Kb = builder.two_electron_jk(Da, Db, it, timings, Ca, Cb)
        Fa = H + J - Ka
        Fb = H + J - Kb

        # Guest-Saunders effective Fock in the current (S-orthonormal) MO
        # basis; assembled blockwise, diagonalized, rotation applied to C
        Fa_mo = Cmo.T @ Fa @ Cmo
        Fb_mo = Cmo.T @ Fb @ Cmo
        R = 0.5 * (Fa_mo + Fb_mo)
        c, o = slice(0, nb), slice(nb, na)
        R[c, o] = Fb_mo[c, o]
        R[o, c] = Fb_mo[o, c]
        v = slice(na, None)
        R[o, v] = Fa_mo[o, v]
        R[v, o] = Fa_mo[v, o]

        # DIIS in the AO frame on the back-transformed effective Fock with
        # the total-density commutator error
        SC = S @ Cmo
        R_ao = SC @ R @ SC.T
        Dt = Da + Db
        with timings.timed(JCTC.diis_time, it):
            e_vec = R_ao @ Dt @ S - S @ Dt @ R_ao
            if float(np.abs(e_vec).max()) < 10.0:
                diis.push(R_ao, e_vec)
            R_x = diis.extrapolate() if diis.size > 0 else R_ao

        if opts.damp and R_old is not None:
            x = linalg.damping_factor(last_dE)
            if x < 1.0:
                R_x = x * R_x + (1.0 - x) * R_old
        R_old = R_ao

        with timings.timed(JCTC.eigensolve_time, it):
            eps, Cmo = _diag_in_x(R_x, X)

        E_elec = 0.5 * float(
            np.sum(Dt * H) + np.sum(Da * Fa) + np.sum(Db * Fb))
        if not np.isfinite(E_elec) or abs(E_elec) > 1.0e8:
            E_old = E_elec
            break  # NaN/garbage never recovers; report a convergence error
        dE = E_elec - E_old
        last_dE = dE
        d_rms = (float(np.sqrt(np.mean((Dt - D_old) ** 2)))
                 if D_old is not None else 1.0)
        E_old = E_elec
        D_old = Dt.copy()

        t_el = time.perf_counter() - t_it
        timings.record(JCTC.iteration_time, t_el, it)
        if output >= 2:
            print(f"{it:4d} {E_elec + e_nuc:20.10f} {dE:12.3e} "
                  f"{d_rms:12.3e} {t_el:8.2f}")

        if abs(dE) <= opts.energy_convergence and \
                d_rms <= opts.density_convergence:
            converged = True
            break

    builder.finalize()
    E_total = E_old + e_nuc
    timings.set_converged(converged, E_total, it)
    timings.run_time = time.perf_counter() - t0
    timings.record(JCTC.run_time, timings.run_time)
    timings.scf_energy = E_total

    if output >= 1:
        tag = "" if converged else " (NOT CONVERGED)"
        print(f"Total ROHF Energy: {E_total:.10f} h{tag}")

    error = None
    if not converged:
        error = {
            "error_type": "convergence_error",
            "error_message": (
                f"ROHF did not converge in {it} iterations "
                f"(dele={opts.energy_convergence}, "
                f"rmsd={opts.density_convergence})"),
            "success": False,
        }

    Ca = Cmo[:, :na]
    Cb = Cmo[:, :nb]
    Da, Db = Ca @ Ca.T, Cb @ Cb.T
    sz = 0.5 * (na - nb)
    return {
        "Error": error,
        "Fock": 0.5 * (Fa + Fb),
        "Fock Alpha": Fa,
        "Fock Beta": Fb,
        "Density": Da + Db,
        "Spin Density": Da - Db,
        "MO Coeff": Cmo,
        "MO Energies": eps,
        "Overlap": S,
        "Energy": E_total,
        "Energy Elec": E_old,
        "E Nuc": e_nuc,
        "S2": sz * (sz + 1.0),       # exact by construction
        "S2 Ideal": sz * (sz + 1.0),
        "Multiplicity": multiplicity,
        "N Alpha": na,
        "N Beta": nb,
        "Converged?": converged,
        "Iterations": it,
        "Timings": timings,
        "Spherical Transform": sph_T,
    }


def _diag_in_x(F_ao: np.ndarray, X: np.ndarray):
    """Diagonalize an AO-frame symmetric operator in the X-orthonormal
    frame; returns (eps, C) with C^T S C = I."""
    Fp = X.T @ F_ao @ X
    eps, Cp = np.linalg.eigh(Fp)
    return eps, X @ Cp
