"""Disk cache for the folded packed-B tensor (models/df_screened.py).

The w64-class B build runs for hours through the TPU relay and the VM
recycles without warning; the cache lets the flagship run resume past its
most expensive phase.  Guarded by a geometry+basis fingerprint.
"""

import warnings

import numpy as np

from juliachem_jl_tpu import basis, molecule
from juliachem_jl_tpu.basis import CalculationBasisSets
from juliachem_jl_tpu.models.df_screened import _load_b_cache, build_B_packed
from juliachem_jl_tpu.utils.options import SCFOptions

WATER = {"symbols": ["O", "H", "H"],
         "geometry": [0.0, 0.0, -0.1294, 0.0, -1.4941, 1.0274,
                      0.0, 1.4941, 1.0274]}


def _bsets(geom_scale=1.0):
    d = dict(WATER, geometry=[g * geom_scale for g in WATER["geometry"]])
    mol = molecule.from_input_dict(d)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return CalculationBasisSets(
            basis.build(mol, "6-31G"),
            basis.build_auxiliary(mol, "cc-pVTZ-JKFIT", "6-31G"))


def test_b_cache_roundtrip_and_fingerprint(tmp_path):
    bs = _bsets()
    opts = SCFOptions()
    opts.df_b_cache = str(tmp_path / "bc")
    B1, s1 = build_B_packed(bs.primary, bs.auxiliary, opts)
    B2, s2 = build_B_packed(bs.primary, bs.auxiliary, opts)
    assert isinstance(B2, np.memmap)  # mmap load, no second RAM copy
    assert np.array_equal(np.asarray(B1), np.asarray(B2))
    assert s1.npq == s2.npq
    assert np.array_equal(s1.pq_flat, s2.pq_flat)
    # a different geometry must MISS (stale-B reuse would corrupt the SCF)
    other = _bsets(geom_scale=1.05)
    assert _load_b_cache(opts.df_b_cache, other.primary,
                         other.auxiliary) is None
