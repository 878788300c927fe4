"""Full RHF + properties run (parity with example_scripts/full-rhf.py):
explicit module sequence with timing dump."""
import sys

import juliachem_jl_tpu as jc


def full_rhf(input_file):
    jc.initialize()
    spec = jc.io.read_input(input_file, output=1)
    mol = jc.molecule.run(spec, output=1)
    basis_sets = jc.basis.run(mol, spec.model, output=1)
    scf = jc.models.rhf.energy(mol, basis_sets, spec.scf_keywords, output=2)
    props = jc.models.properties.run(mol, basis_sets, scf, spec.prop_keywords, output=1)
    scf["Timings"].save_json("timings.json")
    jc.finalize()
    return scf, props


if __name__ == "__main__":
    full_rhf(sys.argv[1])
