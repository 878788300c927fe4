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

# Persistent compilation cache: the class-batched integral kernels compile
# one executable per angular-momentum class; caching them across processes
# removes the dominant cold-start cost (analog of the reference's custom
# sysimage work, tools/sysimg/).
#
# CPU is excluded: this jaxlib segfaults serializing CPU executables into the
# cache (put_executable_and_time), and reloading warns about machine-feature
# mismatches.  TPU (axon) executables round-trip fine.
_cache_dir = os.environ.get("JCHEM_COMPILE_CACHE", os.path.expanduser("~/.cache/jchem_xla"))
_platforms = os.environ.get("JAX_PLATFORMS", "")
if _cache_dir and ("cpu" not in _platforms.lower() and _platforms):
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Default floating dtype used throughout the integral and SCF code.
import numpy as _np

DTYPE = _np.float64

# Allow opting out (e.g. for fp32 experiments) via environment variable.
if os.environ.get("JCHEM_X64", "1") == "0":  # pragma: no cover
    jax.config.update("jax_enable_x64", False)
    DTYPE = _np.float32
