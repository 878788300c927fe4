"""Estimate w64 DF footprints (host-RAM gate for the w7.6 DF north-star):
packed npq under the sigma screen, B bytes, naux, and stream volume/iter."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from juliachem_jl_tpu import basis, io, molecule  # noqa: E402
from juliachem_jl_tpu.models.df import screened_pair_blocks  # noqa: E402
from juliachem_jl_tpu.models.df_screened import build_packed_screen  # noqa: E402
from juliachem_jl_tpu.ops import eri3c  # noqa: E402

NW = int(sys.argv[1]) if len(sys.argv) > 1 else 64

spec = io.read_input("/root/reference/example_inputs/Water/7_6/water_7.6.json")
mol = molecule.from_input_dict(
    {"symbols": spec.molecule["symbols"][: 3 * NW],
     "geometry": spec.molecule["geometry"][: 9 * NW],
     "molecular_charge": 0})
import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    b = basis.build(mol, "6-31+G*")
    aux = basis.build_auxiliary(mol, "cc-pVTZ-JKFIT", "6-31+G*")

metric = eri3c.two_center_metric(aux)
pair_blocks = screened_pair_blocks(b, 1e-5, float(np.diag(metric).max()))
screen = build_packed_screen(b, pair_blocks)
A = aux.nbf
npq1 = screen.npq + 1
print(f"NW={NW} nbf={b.nbf} naux={A} npq={screen.npq} "
      f"fill={screen.fill:.3f}")
print(f"B bytes = {A * npq1 * 8 / 1e9:.1f} GB (f64 host) ; "
      f"f32 stream/iter = {A * npq1 * 4 / 1e9:.1f} GB")
print(f"kept shell pairs = {sum(pb.n for pb in pair_blocks)}")
