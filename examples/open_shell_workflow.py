"""Open-shell workflow demo: UHF vs ROHF on the OH radical, spin
diagnostics, RI-UMP2 correlation, geometry optimization and harmonic
frequencies — all capabilities beyond the RHF-only reference.

Run: JAX_PLATFORMS=cpu PYTHONPATH=/path/to/repo python examples/open_shell_workflow.py
"""

import numpy as np

import juliachem_jl_tpu as jc
from juliachem_jl_tpu.basis import CalculationBasisSets
from juliachem_jl_tpu.models import mp2, optimize, properties, rohf, uhf

jc.initialize()

mol = jc.molecule.from_input_dict({
    "symbols": ["O", "H"],
    "geometry": [0, 0, 0, 0, 0, 0.97],
    "molecular_multiplicity": 2,
})
bsets = jc.basis.run(mol, {"basis": "6-31G"})
flags = {"niter": 80, "dele": 1e-9, "rmsd": 1e-7, "guess": "sad"}

u = uhf.energy(mol, bsets, flags, output=1)
ro = rohf.energy(mol, bsets, flags, output=1)
print(f"UHF  E = {u['Energy']:.8f}  <S^2> = {u['S2']:.4f}")
print(f"ROHF E = {ro['Energy']:.8f}  <S^2> = {ro['S2']:.4f} (exact)")

props = properties.run(mol, bsets, u, {"mulliken": True})
print("Mulliken spin populations:", np.round(
    props["Mulliken Spin Population"], 3))

# RI-UMP2 on the UHF reference (JKFIT used for the demo; RIFIT preferred)
import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    bdf = CalculationBasisSets(
        bsets.primary, jc.basis.build_auxiliary(mol, "cc-pVTZ-JKFIT", "6-31G"))
m = mp2.ri_ump2_energy(u, bdf)
print(f"RI-UMP2 E2 = {m['E2']:.6f} (os {m['E2 Opposite Spin']:.6f}, "
      f"ss {m['E2 Same Spin']:.6f}); SCS = {m['E2 SCS']:.6f}")

# relax the bond on the analytic UHF gradient
opt = optimize.optimize(mol, {"basis": "6-31G"}, flags, method="UHF",
                        output=1)
r = np.linalg.norm(opt["Molecule"].coords[1] - opt["Molecule"].coords[0])
print(f"optimized r(O-H) = {r:.4f} bohr after {opt['Steps']} steps, "
      f"E = {opt['Energy']:.8f}")

jc.finalize()
