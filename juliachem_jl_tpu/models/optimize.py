"""Geometry optimization on the analytic nuclear gradients.

EXCEEDS the reference (whose gradient module is disabled, Gradient.jl:31-32,
so no optimizer can exist there).  BFGS over the Cartesian coordinates with
the analytic RHF/UHF gradient (conventional or RI-fitted functional) as the
Jacobian; each step rebuilds the basis at the displaced geometry and
converges the SCF tightly (loose SCF noise destroys line searches).

The SCF at each new geometry warm-starts from scratch (SAD) — geometries
move little per step, but cross-geometry density extrapolation is left for
a future round.
"""

from __future__ import annotations

import numpy as np

from .. import basis as basis_mod
from .. import molecule as molecule_mod


def optimize(mol, model: dict, scf_flags: dict | None = None,
             method: str = "RHF", gtol: float = 3.0e-5,
             maxiter: int = 50, output: int = 0) -> dict:
    """Minimize the SCF energy over nuclear coordinates.

    model: the input-file model section ({"basis": ..., optionally
    "auxiliary_basis": ...}).  Returns {"Molecule": optimized molecule,
    "Energy": final energy, "Gradient": final gradient [natom,3],
    "Converged?": bool, "Steps": n, "Trajectory": [(E, |g|max), ...]}.
    """
    from scipy.optimize import minimize

    from . import gradient as gradient_mod

    flags = dict(scf_flags or {})
    flags.setdefault("dele", 1e-9)
    flags.setdefault("rmsd", 1e-7)
    flags.setdefault("niter", 80)
    trajectory: list[tuple[float, float]] = []
    state = {"res": None, "coords": None}

    def mol_at(x):
        coords = x.reshape(-1, 3)
        return molecule_mod.Molecule(
            z=mol.z, symbols=mol.symbols, coords=coords,
            charge=mol.charge, multiplicity=mol.multiplicity)

    def eval_eg(x):
        m = mol_at(x)
        bsets = basis_mod.run(m, model)
        res = gradient_mod.run(m, bsets, flags, method=method)
        g = np.asarray(res["Gradient"])
        state["res"], state["coords"] = res, x.copy()
        trajectory.append((float(res["Energy"]), float(np.abs(g).max())))
        if output >= 1:
            print(f"opt step {len(trajectory):3d}  "
                  f"E = {res['Energy']:.10f}  |g|max = {np.abs(g).max():.2e}")
        return float(res["Energy"]), g.reshape(-1)

    x0 = np.asarray(mol.coords, dtype=np.float64).reshape(-1)
    out = minimize(eval_eg, x0, jac=True, method="BFGS",
                   options={"gtol": gtol, "maxiter": maxiter})

    m_final = mol_at(out.x)
    g_final = out.jac.reshape(-1, 3)
    converged = bool(np.abs(g_final).max() < gtol)
    return {
        "Molecule": m_final,
        "Energy": float(out.fun),
        "Gradient": g_final,
        "Converged?": converged,
        "Steps": len(trajectory),
        "Trajectory": trajectory,
        "SCF Result": state["res"],
    }
