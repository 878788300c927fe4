"""Packed screened-pq DF builder: parity vs the dense-B builder.

The packed builder stores B as [A, npq+1] (ScreenedDF.jl:16-77 analog) and
expands per-Q tiles on the fly for exchange; dense stores [A, nbf, nbf] with
zeros outside the surviving pairs — the math is identical, so parity is
tight (float-ordering noise only)."""

import numpy as np
import pytest

from juliachem_jl_tpu import basis, molecule
from juliachem_jl_tpu.basis import CalculationBasisSets
from juliachem_jl_tpu.models import rhf
from juliachem_jl_tpu.models.df import DFFockBuilder
from juliachem_jl_tpu.models.df_screened import ScreenedDFFockBuilder
from juliachem_jl_tpu.utils.options import create_scf_options
from juliachem_jl_tpu.utils.timings import Timings

WATER = {
    "symbols": ["O", "H", "H"],
    "geometry": [0.0, 0.0, 0.116321, 0.0, 0.751155, -0.465285,
                 0.0, -0.751155, -0.465285],
}


@pytest.fixture(scope="module")
def system():
    mol = molecule.from_input_dict(WATER)
    b = CalculationBasisSets(
        basis.build(mol, "6-31G"),
        basis.build_auxiliary(mol, "cc-pVDZ-JKFIT", "6-31G"),
    )
    return mol, b


def test_packed_fock_matches_dense(system):
    mol, b = system
    opts = create_scf_options({"scf_type": "df"})
    dense = DFFockBuilder(b.primary, b.auxiliary, opts, timings=Timings())
    packed = ScreenedDFFockBuilder(b.primary, b.auxiliary, opts,
                                   timings=Timings())
    assert packed.screen.npq <= b.primary.nbf ** 2
    rng = np.random.default_rng(0)
    nbf = b.primary.nbf
    nocc = b.primary.nels // 2
    C = rng.normal(size=(nbf, nocc))
    D = 2.0 * C @ C.T
    t = Timings()
    G_dense = dense.two_electron_fock(D, 1, t, C_occ=C)
    G_packed = packed.two_electron_fock(D, 1, t, C_occ=C)
    assert np.abs(G_dense - G_packed).max() < 1e-9


def test_packed_signed_indefinite(system):
    """Exchange of an indefinite dD must match the dense signed kernel."""
    mol, b = system
    opts = create_scf_options({"scf_type": "df"})
    dense = DFFockBuilder(b.primary, b.auxiliary, opts, timings=Timings())
    packed = ScreenedDFFockBuilder(b.primary, b.auxiliary, opts,
                                   timings=Timings())
    rng = np.random.default_rng(1)
    nbf = b.primary.nbf
    M = rng.normal(size=(nbf, nbf))
    dD = M + M.T  # indefinite
    t = Timings()
    G_dense = dense.two_electron_fock(dD, 1, t, C_occ=None)
    G_packed = packed.two_electron_fock(dD, 1, t, C_occ=None)
    assert np.abs(G_dense - G_packed).max() < 1e-8


def test_packed_scf_energy(system):
    mol, b = system
    flags = {"scf_type": "df", "niter": 60, "dele": 1e-9, "rmsd": 1e-7}
    e_dense = rhf.energy(mol, b, {**flags, "contraction_mode": "dense"})
    e_packed = rhf.energy(mol, b, {**flags, "contraction_mode": "screened"})
    assert e_dense["Converged?"] and e_packed["Converged?"]
    assert abs(e_dense["Energy"] - e_packed["Energy"]) < 1e-9
    # the packed path records the granular W/J/K telemetry
    tkeys = e_packed["Timings"].timings
    assert any(k.startswith("K_time-") for k in tkeys)
    assert any(k.startswith("V_time-") for k in tkeys)


def test_packed_qchunk_blocking(system):
    """df_exchange_n_blocks forces multi-block exchange; results unchanged."""
    mol, b = system
    opts = create_scf_options({"scf_type": "df", "df_exchange_n_blocks": 4})
    packed = ScreenedDFFockBuilder(b.primary, b.auxiliary, opts,
                                   timings=Timings())
    assert packed.q_chunk < packed.A
    opts1 = create_scf_options({"scf_type": "df"})
    one = ScreenedDFFockBuilder(b.primary, b.auxiliary, opts1,
                                timings=Timings())
    rng = np.random.default_rng(2)
    nbf = b.primary.nbf
    C = rng.normal(size=(nbf, 5))
    D = 2.0 * C @ C.T
    t = Timings()
    G4 = packed.two_electron_fock(D, 1, t, C_occ=C)
    G1 = one.two_electron_fock(D, 1, t, C_occ=C)
    assert np.abs(G4 - G1).max() < 1e-9
