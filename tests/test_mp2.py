"""RI-MP2 tests: against an exact (full-ERI) MP2 oracle computed in-test."""

import numpy as np

from juliachem_jl_tpu import basis, molecule
from juliachem_jl_tpu.basis import CalculationBasisSets
from juliachem_jl_tpu.models import mp2, rhf
from juliachem_jl_tpu.ops.eri import full_eri_tensor

WATER = {
    "symbols": ["O", "H", "H"],
    "geometry": [0.0, 0.0, 0.116321, 0.0, 0.751155, -0.465285, 0.0, -0.751155, -0.465285],
}


def exact_mp2(res, b, nocc):
    G = full_eri_tensor(b)
    C = np.asarray(res["MO Coeff"])
    eps = np.asarray(res["MO Energies"])
    mo = np.einsum("pqrs,pi,qa,rj,sb->iajb", G,
                   C[:, :nocc], C[:, nocc:], C[:, :nocc], C[:, nocc:],
                   optimize=True)
    eo, ev = eps[:nocc], eps[nocc:]
    denom = eo[:, None, None, None] - ev[None, :, None, None] \
        + eo[None, None, :, None] - ev[None, None, None, :]
    t = mo / denom
    return float(np.sum(t * (2.0 * mo - mo.transpose(0, 3, 2, 1))))


def test_ri_mp2_water_631g():
    mol = molecule.from_input_dict(WATER)
    b = CalculationBasisSets(
        basis.build(mol, "6-31G"),
        basis.build_auxiliary(mol, "cc-pVTZ-JKFIT", "6-31G"),
    )
    res = rhf.energy(mol, b, {"niter": 60, "dele": 1e-10, "rmsd": 1e-8})
    assert res["Converged?"]
    e2_exact = exact_mp2(res, b.primary, b.primary.nels // 2)
    out = mp2.ri_mp2_energy(res, b)
    # MP2 correlation for water/6-31G is ~ -0.13 Eh; RI error << 1e-3
    assert -0.30 < e2_exact < -0.05
    assert abs(out["E2"] - e2_exact) < 5e-4
    assert abs(out["Energy"] - (res["Energy"] + out["E2"])) < 1e-12


def test_ri_mp2_sharded_matches_single_device():
    """Mesh-sharded RI-MP2 (Q-sharded B + i-block scan, models/mp2.py)
    must reproduce the single-device E2 to 1e-10 (VERDICT r2 item 7)."""
    from types import SimpleNamespace

    mol = molecule.from_input_dict(WATER)
    b = CalculationBasisSets(
        basis.build(mol, "6-31G"),
        basis.build_auxiliary(mol, "cc-pVTZ-JKFIT", "6-31G"),
    )
    res = rhf.energy(mol, b, {"niter": 60, "dele": 1e-10, "rmsd": 1e-8})
    assert res["Converged?"]
    e2_1 = mp2.ri_mp2_energy(res, b)["E2"]
    out = mp2.ri_mp2_energy(
        res, b, opts=SimpleNamespace(num_devices=4))
    assert abs(out["E2"] - e2_1) < 1e-10
    assert abs(out["Energy"] - (res["Energy"] + out["E2"])) < 1e-12
