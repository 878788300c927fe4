"""Global numerical configuration.

Chemistry needs ~1e-8 Eh absolute energy accuracy (SURVEY.md §4: S22 energies
must match GAMESS to Julia-`isapprox` rtol ≈1.5e-8).  We therefore enable
double precision globally; TPU executes f64 via software emulation, which is
acceptable for the O(mu^3) linear algebra, while hot contractions can opt into
split/compensated precision explicitly.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Default floating dtype used throughout the integral and SCF code.
import numpy as _np

DTYPE = _np.float64

# Allow opting out (e.g. for fp32 experiments) via environment variable.
if os.environ.get("JCHEM_X64", "1") == "0":  # pragma: no cover
    jax.config.update("jax_enable_x64", False)
    DTYPE = _np.float32
