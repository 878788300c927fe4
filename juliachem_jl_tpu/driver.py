"""End-to-end driver: input file -> energy + properties.

Mirrors the reference's canonical script sequence
(example_scripts/full-rhf.jl / minimal-rhf.jl):
  initialize -> JCInput.run -> JCMolecule.run -> JCBasis.run ->
  JCRHF.Energy.run -> JCRHF.Properties.run -> finalize.
"""

from __future__ import annotations

from . import basis as basis_mod
from . import io as io_mod
from . import molecule as molecule_mod
from .models import gradient as gradient_mod
from .models import properties as properties_mod
from .models import rhf as rhf_mod


def _energy_for(method: str, mol, bsets, scf_flags, output: int) -> dict:
    """Dispatch the SCF energy by model method (RHF / UHF / ROHF)."""
    if method == "UHF":
        from .models import uhf as uhf_mod

        return uhf_mod.energy(mol, bsets, scf_flags, output=output)
    if method == "ROHF":
        from .models import rohf as rohf_mod

        return rohf_mod.energy(mol, bsets, scf_flags, output=output)
    return rhf_mod.energy(mol, bsets, scf_flags, output=output)


def run_spec(spec, output: int = 0) -> dict:
    mol = molecule_mod.run(spec, output=output)
    bsets = basis_mod.run(mol, spec.model, output=output)
    scf_flags = dict(spec.scf_keywords)
    if spec.auxiliary_basis and "scf_type" not in scf_flags:
        scf_flags["scf_type"] = "df"
    method = str(spec.model.get("method", "RHF")).upper()
    if spec.driver == "optimize":
        from .models import optimize as optimize_mod

        result = optimize_mod.optimize(mol, spec.model, scf_flags,
                                       method=method, output=output)
        result = {**result.pop("SCF Result"), **result}
    elif spec.driver == "frequencies":
        from .models import hessian as hessian_mod

        freq = hessian_mod.frequencies(mol, spec.model, scf_flags,
                                       method=method, output=output)
        result = {**_energy_for(method, mol, bsets, scf_flags, output),
                  **freq}
    elif spec.driver == "gradient":
        result = gradient_mod.run(mol, bsets, scf_flags, output=output,
                                  method=method)
    else:
        result = _energy_for(method, mol, bsets, scf_flags, output)
    props = properties_mod.run(mol, bsets, result, spec.prop_keywords, output=output)
    return {
        "Input": spec,
        "Molecule": mol,
        "Basis": bsets,
        "Energy": result,
        "Properties": props,
    }


def run_file(path: str, output: int = 0) -> dict:
    """Run a QCSchema-style JSON input file end to end."""
    spec = io_mod.read_input(path, output=output)
    return run_spec(spec, output=output)
