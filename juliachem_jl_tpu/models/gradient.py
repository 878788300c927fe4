"""RHF nuclear gradients.

Parity note: this EXCEEDS the reference, which scaffolds gradients but
explicitly disables them ("does not yet support RHF gradients",
src/rhf/gradient/Gradient.jl:31-32) while implementing only the one-electron
helper assembly (GradHelpers.jl:65-467).  Here the full analytic RHF nuclear
gradient works end-to-end:

    dE/dR = dE_nuc + sum D (dT + dV) - sum W dS + dE_2e

with the two-electron term from the class-batched ERI derivative kernels
(ops/eri_grad.py), validated against finite differences of the converged SCF
energy (tests/test_gradients.py)."""

from __future__ import annotations

import numpy as np


def nuclear_repulsion_gradient(mol) -> np.ndarray:
    """d E_nuc / d R: reference GradHelpers.jl:38-63."""
    coords = mol.coords
    z = np.asarray(mol.z, dtype=float)
    diff = coords[:, None, :] - coords[None, :, :]      # [i, j, 3]
    r2 = (diff**2).sum(-1)
    np.fill_diagonal(r2, 1.0)
    inv_r3 = 1.0 / np.sqrt(r2) ** 3
    np.fill_diagonal(inv_r3, 0.0)
    zz = np.outer(z, z)
    return -(zz[:, :, None] * inv_r3[:, :, None] * diff).sum(axis=1)


def one_electron_gradient(mol, basis, D: np.ndarray, W: np.ndarray) -> np.ndarray:
    """The one-electron part of dE/dR (GradHelpers.jl:65-467 assembly):

        grad[k] = sum_pq D_pq (dT + dV)_pq/dR_k  -  sum_pq W_pq dS_pq/dR_k

    D is the (factor-2) SCF density and W the energy-weighted density
    (scf.energy_weighted_density).  The missing piece for a total RHF
    gradient is the two-electron ERI-derivative term (absent in the
    reference as well)."""
    from ..ops.oei_grad import stv_gradients

    dS, dT, dV = stv_gradients(basis, mol)
    dH = dT + dV
    grad = np.einsum("pq,kdpq->kd", D, dH) - np.einsum("pq,kdpq->kd", W, dS)
    return grad


def total_gradient(mol, basis, D: np.ndarray, W: np.ndarray,
                   aux=None) -> np.ndarray:
    """Full analytic RHF gradient [natom, 3] from a converged density.

    aux=None differentiates the exact (conventional) two-electron energy;
    with an auxiliary basis the RI-fitted energy is differentiated instead
    (including the 3-center and metric derivative terms), consistent with a
    density-fitted SCF's own functional."""
    from ..ops.eri_grad import df_two_electron_gradient, two_electron_gradient

    g2 = (two_electron_gradient(basis, mol, D) if aux is None
          else df_two_electron_gradient(basis, aux, mol, D))
    return (nuclear_repulsion_gradient(mol)
            + one_electron_gradient(mol, basis, D, W)
            + g2)


def total_gradient_uhf(mol, basis, uhf_result, aux=None) -> np.ndarray:
    """Full analytic UHF gradient [natom, 3] from a converged UHF result:
    the one-electron term contracts the total density and the spin-summed
    energy-weighted density, the two-electron term the UHF two-particle
    density (conventional, or the RI-fitted functional when aux is given)."""
    from ..ops.eri_grad import df_two_electron_gradient, two_electron_gradient

    na, nb = int(uhf_result["N Alpha"]), int(uhf_result["N Beta"])
    Ca = np.asarray(uhf_result["MO Coeff Alpha"])
    Cb = np.asarray(uhf_result["MO Coeff Beta"])
    ea = np.asarray(uhf_result["MO Energies Alpha"])
    eb = np.asarray(uhf_result["MO Energies Beta"])
    Da = Ca[:, :na] @ Ca[:, :na].T
    Db = Cb[:, :nb] @ Cb[:, :nb].T
    W = ((Ca[:, :na] * ea[:na][None, :]) @ Ca[:, :na].T
         + (Cb[:, :nb] * eb[:nb][None, :]) @ Cb[:, :nb].T)
    Tsph = uhf_result.get("Spherical Transform")
    if Tsph is not None:
        # geometry-independent transform: contract the Cartesian derivative
        # integrals with the back-transformed spin densities / Pulay weight
        Da, Db, W = (Tsph @ M @ Tsph.T for M in (Da, Db, W))
    if aux is None:
        g2 = two_electron_gradient(basis, mol, Da + Db,
                                   spin_densities=(Da, Db))
    else:
        g2 = df_two_electron_gradient(basis, aux, mol, Da + Db,
                                      spin_densities=(Da, Db))
    return (nuclear_repulsion_gradient(mol)
            + one_electron_gradient(mol, basis, Da + Db, W)
            + g2)


def total_gradient_rohf(mol, basis, rohf_result, aux=None) -> np.ndarray:
    """Analytic ROHF gradient [natom, 3].

    Uses the general SCF Pulay weight
        W = 1/2 sum_s (D_s F_s S^-1 + S^-1 F_s D_s)
    which is valid for any converged single-determinant SCF (for UHF it
    reduces to C_occ eps C_occ^T per spin since F_s is diagonal in its own
    MOs; for ROHF the shared orbitals diagonalize the effective Fock, not
    F_a/F_b, so the general form is required).  The two-electron term is
    the same spin two-particle density as UHF, with D_a/D_b built from the
    one shared orbital set."""
    from ..ops.eri_grad import df_two_electron_gradient, two_electron_gradient

    na, nb = int(rohf_result["N Alpha"]), int(rohf_result["N Beta"])
    C = np.asarray(rohf_result["MO Coeff"])
    S = np.asarray(rohf_result["Overlap"])
    Fa = np.asarray(rohf_result["Fock Alpha"])
    Fb = np.asarray(rohf_result["Fock Beta"])
    Da = C[:, :na] @ C[:, :na].T
    Db = C[:, :nb] @ C[:, :nb].T
    W = np.zeros_like(S)
    for Ds, Fs in ((Da, Fa), (Db, Fb)):
        X = np.linalg.solve(S, Fs @ Ds)          # S^-1 F_s D_s
        W += 0.5 * (X + X.T)
    Tsph = rohf_result.get("Spherical Transform")
    if Tsph is not None:
        Da, Db, W = (Tsph @ M @ Tsph.T for M in (Da, Db, W))
    if aux is None:
        g2 = two_electron_gradient(basis, mol, Da + Db,
                                   spin_densities=(Da, Db))
    else:
        g2 = df_two_electron_gradient(basis, aux, mol, Da + Db,
                                      spin_densities=(Da, Db))
    return (nuclear_repulsion_gradient(mol)
            + one_electron_gradient(mol, basis, Da + Db, W)
            + g2)


def run(mol, basis_sets, scf_flags=None, output: int = 0,
        method: str = "RHF") -> dict:
    """API shape of JCRHF.Gradient.run (Gradient.jl:19-29) — but actually
    working: converges the SCF and returns the analytic nuclear gradient of
    the same energy functional (conventional, or RI-fitted when
    scf_type=df; method="UHF" differentiates the unrestricted functional,
    conventional only)."""
    from . import rhf

    if basis_sets is None or getattr(basis_sets, "primary", None) is None:
        raise ValueError("gradient.run requires built basis sets "
                         "(basis.run(mol, model))")
    flags = dict(scf_flags or {})
    use_df = str(flags.get("scf_type", "rhf")).lower() == "df"
    if use_df and basis_sets.auxiliary is None:
        raise ValueError("scf_type=df gradient requires an auxiliary basis")
    if method.upper() == "UHF":
        from . import uhf

        res = uhf.energy(mol, basis_sets, flags, output=output)
        if not res.get("Converged?"):
            raise RuntimeError("gradient requested on an unconverged SCF")
        grad = total_gradient_uhf(
            mol, basis_sets.primary, res,
            aux=basis_sets.auxiliary if use_df else None)
    elif method.upper() == "ROHF":
        from . import rohf

        res = rohf.energy(mol, basis_sets, flags, output=output)
        if not res.get("Converged?"):
            raise RuntimeError("gradient requested on an unconverged SCF")
        grad = total_gradient_rohf(
            mol, basis_sets.primary, res,
            aux=basis_sets.auxiliary if use_df else None)
    else:
        res = rhf.energy(mol, basis_sets, flags, output=output)
        if not res.get("Converged?"):
            raise RuntimeError("gradient requested on an unconverged SCF")
        D, W = np.asarray(res["Density"]), np.asarray(res["W"])
        Tsph = res.get("Spherical Transform")
        if Tsph is not None:
            # dT/dR = 0, so the spherical gradient is exactly the Cartesian
            # assembly contracted with the back-transformed D and W
            D, W = Tsph @ D @ Tsph.T, Tsph @ W @ Tsph.T
        grad = total_gradient(
            mol, basis_sets.primary, D, W,
            aux=basis_sets.auxiliary if use_df else None)
    if output >= 2:
        print(f"{method.upper()} nuclear gradient (Eh/bohr):")
        for k in range(mol.natom):
            print(f"  {mol.symbols[k]:2s} {grad[k, 0]: .10f} "
                  f"{grad[k, 1]: .10f} {grad[k, 2]: .10f}")
    return {**res, "Gradient": grad}
