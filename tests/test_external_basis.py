"""External GAMESS-US basis file support (basis/external.py).

Round-trips the bundled library data through the GAMESS text format: the
parsed file must reproduce the library's shells exactly, and an RHF energy
run from a registered external file must match the library-based run
bit-for-bit.  This is the coverage escape hatch for elements outside the
bundled exact-data set (reference bsed.h5 keys H-Xe, BasisHelpers.jl:1-59).
"""

import numpy as np

from juliachem_jl_tpu import basis, molecule
from juliachem_jl_tpu.basis import external, library
from juliachem_jl_tpu.basis import CalculationBasisSets
from juliachem_jl_tpu.models import rhf

WATER = {
    "symbols": ["O", "H", "H"],
    "geometry": [0.0, 0.0, 0.116321,
                 0.0, 0.751155, -0.465285,
                 0.0, -0.751155, -0.465285],
    "molecular_charge": 0,
}

_NAMES = {"H": "HYDROGEN", "O": "OXYGEN"}


def _to_gamess(name: str, elements: list[str]) -> str:
    lines = ["! exported from the bundled library for round-trip testing",
             "$DATA"]
    for el in elements:
        lines.append(_NAMES[el])
        for sh in library.lookup(el, name):
            if sh["l"] == "L":
                lines.append(f"L   {len(sh['exps'])}")
                for k, (e, cs, cp) in enumerate(
                        zip(sh["exps"], sh["coefs_s"], sh["coefs_p"])):
                    lines.append(f"  {k + 1}  {e:.10f}  {cs:.10f}  {cp:.10f}")
            else:
                lines.append(f"{sh['l']}   {len(sh['exps'])}")
                for k, (e, c) in enumerate(zip(sh["exps"], sh["coefs"])):
                    lines.append(f"  {k + 1}  {e:.10f}  {c:.10f}")
        lines.append("")
    lines.append("$END")
    return "\n".join(lines)


def test_gamess_roundtrip_shells():
    text = _to_gamess("6-31G", ["O", "H"])
    parsed = external.parse_gamess_basis(text)
    assert set(parsed) == {"O", "H"}
    for el in ("O", "H"):
        ref = library.lookup(el, "6-31G")
        got = parsed[el]
        assert len(got) == len(ref)
        for a, b in zip(got, ref):
            assert a["l"] == b["l"]
            assert np.allclose(a["exps"], b["exps"], rtol=1e-12)
            key = "coefs" if a["l"] != "L" else "coefs_s"
            assert np.allclose(a[key], b[key], rtol=1e-12)


def test_external_file_energy_matches_library(tmp_path):
    path = tmp_path / "my631g.gbs"
    path.write_text(_to_gamess("6-31G", ["O", "H"]))

    mol = molecule.from_input_dict(WATER)
    flags = {"niter": 60, "dele": 1e-9, "rmsd": 1e-7}
    e_lib = rhf.energy(
        mol, CalculationBasisSets(basis.build(mol, "6-31G"), None), flags)

    name = basis.register_basis_file(str(path), name="user-631g")
    assert name == "user-631g"
    e_ext = rhf.energy(
        mol, CalculationBasisSets(basis.build(mol, "user-631g"), None), flags)
    assert abs(e_ext["Energy"] - e_lib["Energy"]) < 1e-12


def test_model_basis_file_key(tmp_path):
    path = tmp_path / "file631g.gbs"
    path.write_text(_to_gamess("6-31G", ["O", "H"]))
    mol = molecule.from_input_dict(WATER)
    bsets = basis.run(mol, {"basis": "file-631g",
                            "basis_file": str(path)})
    assert bsets.primary.nbf == basis.build(mol, "6-31G").nbf
