"""RHF + properties from an .xyz file (parity with
example_scripts/rhf-properties-xyz.py)."""
import sys

import juliachem_jl_tpu as jc


def rhf_xyz(xyz_file, basis="6-31G", charge=0):
    jc.initialize()
    molecule_dict = jc.io.xyz_to_molecule_dict(xyz_file, charge)
    spec = jc.io.parse_input({
        "molecule": molecule_dict,
        "driver": "energy",
        "model": {"method": "RHF", "basis": basis},
        "keywords": {"scf": {"niter": 100, "dele": 1e-8, "rmsd": 1e-6},
                     "prop": {"mo energies": True, "mulliken": True,
                              "multipole": "dipole"}},
    })
    out = jc.run_spec(spec, output=2)
    jc.finalize()
    return out


if __name__ == "__main__":
    rhf_xyz(sys.argv[1], *(sys.argv[2:]))
