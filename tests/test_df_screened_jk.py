"""Spin-resolved J/K on the packed screened-DF path (models/df_screened_jk).

Validated against the dense fitted-B builder's two_electron_jk on the same
auxiliary basis (identical fit => identical J/K to machine precision), and
end-to-end: screened DF-UHF equals dense DF-UHF and the closed-shell limit
equals DF-RHF.
"""

import numpy as np
import pytest

from juliachem_jl_tpu import basis, molecule
from juliachem_jl_tpu.basis import CalculationBasisSets
from juliachem_jl_tpu.models import rhf, uhf
from juliachem_jl_tpu.models.df import DFFockBuilder
from juliachem_jl_tpu.models.df_screened_jk import ScreenedDFJKBuilder
from juliachem_jl_tpu.utils.options import create_scf_options
from juliachem_jl_tpu.utils.timings import Timings

WATER = {
    "symbols": ["O", "H", "H"],
    "geometry": [0.0, 0.0, 0.116321, 0.0, 0.751155, -0.465285,
                 0.0, -0.751155, -0.465285],
}
TIGHT = {"niter": 60, "dele": 1e-9, "rmsd": 1e-7}


@pytest.fixture(scope="module")
def system():
    mol = molecule.from_input_dict(WATER)
    b = CalculationBasisSets(
        basis.build(mol, "6-31G"),
        basis.build_auxiliary(mol, "cc-pVTZ-JKFIT", "6-31G"))
    return mol, b


def _random_spin_density(nbf, nocc, seed):
    rng = np.random.default_rng(seed)
    C = np.linalg.qr(rng.normal(size=(nbf, nbf)))[0][:, :nocc]
    return C @ C.T, C


def test_jk_matches_dense_builder(system):
    mol, b = system
    opts = create_scf_options({"scf_type": "df"})
    t = Timings()
    dense = DFFockBuilder(b.primary, b.auxiliary, opts, timings=t)
    screened = ScreenedDFJKBuilder(b.primary, b.auxiliary, opts, timings=t)
    nbf = b.primary.nbf
    Da, Ca = _random_spin_density(nbf, 5, seed=1)
    Db, Cb = _random_spin_density(nbf, 4, seed=2)

    Jd, Kad, Kbd = dense.two_electron_jk(Da, Db, 1, t, Ca, Cb)
    # explicit-orbital path
    Js, Kas, Kbs = screened.two_electron_jk(Da, Db, 1, t, Ca, Cb)
    assert np.abs(np.asarray(Js) - np.asarray(Jd)).max() < 1e-9
    assert np.abs(np.asarray(Kas) - np.asarray(Kad)).max() < 1e-9
    assert np.abs(np.asarray(Kbs) - np.asarray(Kbd)).max() < 1e-9
    # eigenfactor path (no orbitals, e.g. SAD first iteration)
    Js2, Kas2, Kbs2 = screened.two_electron_jk(Da, Db, 2, t, None, None)
    assert np.abs(np.asarray(Js2) - np.asarray(Jd)).max() < 1e-9
    assert np.abs(np.asarray(Kas2) - np.asarray(Kad)).max() < 1e-8
    assert np.abs(np.asarray(Kbs2) - np.asarray(Kbd)).max() < 1e-8


def test_jk_blocked_exchange_path(system):
    mol, b = system
    opts = create_scf_options({"scf_type": "df"})
    t = Timings()
    dense = DFFockBuilder(b.primary, b.auxiliary, opts, timings=t)
    screened = ScreenedDFJKBuilder(b.primary, b.auxiliary, opts, timings=t)
    screened.k_blocks = 2  # force the lower-triangular blocked K path
    nbf = b.primary.nbf
    Da, Ca = _random_spin_density(nbf, 5, seed=3)
    Db, Cb = _random_spin_density(nbf, 4, seed=4)
    Jd, Kad, Kbd = dense.two_electron_jk(Da, Db, 1, t, Ca, Cb)
    Js, Kas, Kbs = screened.two_electron_jk(Da, Db, 1, t, Ca, Cb)
    assert np.abs(np.asarray(Js) - np.asarray(Jd)).max() < 1e-9
    assert np.abs(np.asarray(Kas) - np.asarray(Kad)).max() < 1e-9
    assert np.abs(np.asarray(Kbs) - np.asarray(Kbd)).max() < 1e-9


def test_screened_df_uhf_end_to_end(system):
    mol, b = system
    # closed shell: screened DF-UHF == DF-RHF
    e_rhf = rhf.energy(mol, b, {**TIGHT, "scf_type": "df"})["Energy"]
    r = uhf.energy(mol, b, {**TIGHT, "scf_type": "df",
                            "contraction_mode": "screened"})
    assert r["Converged?"]
    assert abs(r["Energy"] - e_rhf) < 1e-8

    # open shell doublet: screened == dense
    oh = molecule.from_input_dict({
        "symbols": ["O", "H"],
        "geometry": [0.0, 0.0, 0.0, 0.0, 0.0, 0.9697],
    })
    bo = CalculationBasisSets(
        basis.build(oh, "6-31G"),
        basis.build_auxiliary(oh, "cc-pVTZ-JKFIT", "6-31G"))
    kw = {**TIGHT, "scf_type": "df", "multiplicity": 2}
    e_dense = uhf.energy(oh, bo, kw)["Energy"]
    r_scr = uhf.energy(oh, bo, {**kw, "contraction_mode": "screened"})
    assert r_scr["Converged?"]
    assert abs(r_scr["Energy"] - e_dense) < 1e-8


def test_sharded_jk_multidevice(system):
    """Mesh-sharded spin-resolved J/K (models/df_sharded_jk.py) on the
    8-virtual-device CPU mesh: UHF with num_devices=8 equals the dense
    single-device DF-UHF, closed and open shell."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh (conftest)")
    mol, b = system
    kw = {**TIGHT, "scf_type": "df"}
    e1 = uhf.energy(mol, b, kw)["Energy"]
    rn = uhf.energy(mol, b, {**kw, "num_devices": 8})
    assert rn["Converged?"]
    assert abs(rn["Energy"] - e1) < 1e-9

    oh = molecule.from_input_dict({
        "symbols": ["O", "H"],
        "geometry": [0.0, 0.0, 0.0, 0.0, 0.0, 0.9697],
    })
    bo = CalculationBasisSets(
        basis.build(oh, "6-31G"),
        basis.build_auxiliary(oh, "cc-pVTZ-JKFIT", "6-31G"))
    kw2 = {**TIGHT, "scf_type": "df", "multiplicity": 2}
    e_dense = uhf.energy(oh, bo, kw2)["Energy"]
    r_sh = uhf.energy(oh, bo, {**kw2, "num_devices": 8})
    assert r_sh["Converged?"]
    assert abs(r_sh["Energy"] - e_dense) < 1e-9
