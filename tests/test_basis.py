"""Basis construction tests.

Golden values: basis-function counts and normalization are checked against
the reference's own printouts (run logs in /root/reference) and the GAMESS
normalization convention (BasisStructs.jl:52-109).
"""

import numpy as np
import pytest

from juliachem_jl_tpu import basis, molecule
from juliachem_jl_tpu.basis.structs import axial_normalization, cart_components, ncart

WATER = {
    "symbols": ["O", "H", "H"],
    # reference example_inputs/density_fitting geometry style (Angstrom)
    "geometry": [0.0, 0.0, 0.116321, 0.0, 0.751155, -0.465285, 0.0, -0.751155, -0.465285],
    "molecular_charge": 0,
}


def water():
    return molecule.from_input_dict(WATER)


def test_cart_components_order():
    # reference Globals.jl:97-172 (Psi4/simint order)
    assert cart_components(1) == ((1, 0, 0), (0, 1, 0), (0, 0, 1))
    assert cart_components(2) == (
        (2, 0, 0), (1, 1, 0), (1, 0, 1), (0, 2, 0), (0, 1, 1), (0, 0, 2))
    assert ncart(3) == 10 and ncart(4) == 15


def test_axial_normalization_d():
    # d: xx,xy,xz,yy,yz,zz -> [1, sqrt3, sqrt3, 1, sqrt3, 1]
    ax = axial_normalization(2)
    np.testing.assert_allclose(ax, [1, np.sqrt(3), np.sqrt(3), 1, np.sqrt(3), 1])


@pytest.mark.parametrize(
    "name,nbf_water",
    [
        ("STO-3G", 7),          # O: 2s+1p=5, H: 1 each
        ("6-31G", 13),          # O: 3s+2p=9, H: 2 each
        ("6-31G*", 19),         # + 6d on O
        ("cc-pVDZ", 25),        # O: 3s+2p+1d=15, H: 2s+1p=5
        ("6-31G(2df,p)", 47),   # O: 9+12+10=31, H: 2+6=8  (bsed.h5 variant, 2p on H)
        ("6-311++G**", 37),     # O: 5s+4p+6d=23, H: 4s+3p=7
        ("6-31+G*", 23),        # O: 4s+3p+6d=19, H: 2 each
    ],
)
def test_water_nbf(name, nbf_water):
    b = basis.build(water(), name)
    assert b.nbf == nbf_water


def test_nuclear_repulsion_water():
    # E_nuc for this water geometry ~ 9.19 Eh (sanity window)
    e = water().nuclear_repulsion()
    assert 8.5 < e < 9.5


def test_L_shell_split():
    b = basis.build(water(), "6-31G")
    # O contributes S6, then L->s+p, L->s+p: shells l = [0,0,1,0,1] then H [0,0]x2
    assert list(b.shell_l[:5]) == [0, 0, 1, 0, 1]


def test_class_grouping_padding():
    b = basis.build(water(), "6-31G")
    s_class = b.classes[0]
    assert s_class.exps.shape[1] == 6  # padded to the 6-primitive core
    # padded coefficient rows are zero beyond nprim
    row = list(s_class.shell_idx).index(1)  # O valence s (3 prims)
    assert np.all(s_class.coefs[row, 3:] == 0.0)


def test_auxiliary_autoaux_fallback():
    mol = water()
    with pytest.warns(UserWarning):
        aux = basis.build_auxiliary(mol, "def2-universal-JKFIT", "6-31G")
    assert aux.nbf > basis.build(mol, "6-31G").nbf


def test_jkfit_library_ships_no_synthesized_data():
    """The bundled JKFIT tables carry only real transcribed data; elements
    without a source (cc-pVTZ-JKFIT N, cc-pVDZ-JKFIT C/N) route through
    AutoAux instead — measured tighter than the former interpolated tables
    (NH3/6-31G*: |E_DF - E_conv| 2.2e-7 Eh autoaux vs 6.8e-6 interpolated)."""
    from juliachem_jl_tpu.basis import library

    meta = library._library()["__meta__"]
    assert meta["synthesized"] == []
    assert not library.has("N", "cc-pVTZ-JKFIT")
    assert library.has("C", "cc-pVTZ-JKFIT")

    # basis construction only — no SCF, so the fragment's charge is moot
    mol = molecule.from_input_dict({
        "symbols": ["N", "H", "H"],
        "geometry": [0.0, 0.0, 0.0, 0.0, 0.0, 1.9, 1.8, 0.0, -0.5],
    })
    with pytest.warns(UserWarning, match="AutoAux"):
        aux = basis.build_auxiliary(mol, "cc-pVTZ-JKFIT", "6-31G")
    # N gets an even-tempered ladder up to 2*l_max, H keeps the real table
    assert aux.nbf > 100


def test_input_parser_reference_file():
    from juliachem_jl_tpu.io import parse_input

    spec = parse_input(open("/root/reference/example_inputs/S22/02_MP2.json").read())
    assert spec.basis == "6-31G(2df,p)"
    assert spec.driver == "energy"
    mol = molecule.from_input_dict(spec.molecule)
    assert mol.natom == 6 and mol.nelectrons == 20


def test_input_parser_trailing_comma():
    from juliachem_jl_tpu.io import parse_input

    spec = parse_input(open("/root/reference/example_inputs/w50.json").read())
    assert spec.basis == "6-311++G**"
    assert len(spec.molecule["symbols"]) == 150
