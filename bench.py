"""Benchmark: DF-RHF Fock-build throughput on a water cluster.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

System: the first NW waters of the reference's w7.6 benchmark cluster
(example_inputs/Water/7_6/water_7.6.json, 64 waters) at the same basis
(6-31+G*), run DF-RHF with cc-pVTZ-JKFIT.  Metric: mean wall time of the
per-iteration two-electron Fock build (J+K from the fitted B tensor), the
quantity the reference's per-iteration timings track (JCTC.fock_time).

vs_baseline: the reference's committed w7.6 benchmark converged in 33
iterations over 2316 s on a 112-thread Skylake node (BASELINE.md), i.e.
~70.2 s per iteration for 64 waters.  Conventional screened Fock work scales
~O(n_pairs) ~ O(N^2) in the number of waters at fixed basis, so the scaled
reference per-iteration time for NW waters is 70.2 * (NW/64)^2.
vs_baseline = scaled_reference_time / measured_time (>1 means faster than
the scaled reference).  This cross-algorithm, cross-hardware scaling estimate
is replaced by a direct same-system comparison once the full w7.6 runs
on-device (sharded path).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# default w16 (368 bf / 2656 aux): beyond the round-1 single-chip ceiling
# (w12) thanks to the packed screened-pq B + chunked metric solve.
# "w50" runs the BASELINE.json north-star config instead: the committed
# example_inputs/w50.json cluster (150 atoms) at RHF/cc-pVDZ, SCF driven to
# 1e-8 Eh (no reference wall-time exists for it — BASELINE.md table — so the
# metric is recorded without a vs_baseline scaling).
W50 = len(sys.argv) > 1 and sys.argv[1] == "w50"
NW = (int(sys.argv[1])
      if len(sys.argv) > 1 and not W50 and sys.argv[1].isdigit() else 16)
# "conv": run the conventional screened-direct path instead of DF.  For the
# NW=64 (w7.6) north-star this is the same-algorithm comparison: the
# reference's 2316 s Skylake number is conventional direct SCF, and at w64
# the packed B tensor (~40-70 GB) cannot stream through the relay anyway.
CONV = "conv" in sys.argv[1:]
REF_SECONDS_PER_ITER_W64 = 2316.0 / 33.0


def _device_available(timeout_s: float = 240.0) -> bool:
    """Probe the accelerator in a subprocess: the axon TPU relay, when its
    far side is down, blocks jax.devices() in an infinite claim-retry loop
    (no timeout surfaces in-process), which would hang the whole bench."""
    import os
    import subprocess
    import sys as _sys

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return True
    try:
        proc = subprocess.run(
            [_sys.executable, "-c",
             "import jax, jax.numpy as jnp; x = jnp.ones((64, 64)); "
             "(x @ x).block_until_ready()"],
            timeout=timeout_s, capture_output=True)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _other_chip_users() -> list:
    """PIDs of other processes that may hold the axon relay chip.

    The relay chip is single-tenant in practice: two processes running ops
    concurrently corrupt each other's device buffers (observed garbage SCF
    energies ~1e14 and convergence stalls).  The driver's end-of-round bench
    must therefore wait for any in-flight sweep/bench to finish."""
    import os

    skip = set()
    pid = os.getpid()
    while pid > 1:  # own ancestor chain (timeout/shell wrappers name bench.py)
        skip.add(pid)
        try:
            with open(f"/proc/{pid}/status") as f:
                pid = int(next(l for l in f if l.startswith("PPid:")).split()[1])
        except (OSError, StopIteration, ValueError):
            break
    pids = []
    for entry in os.listdir("/proc"):
        if not entry.isdigit() or int(entry) in skip:
            continue
        try:
            with open(f"/proc/{entry}/cmdline", "rb") as f:
                cmd = f.read().decode(errors="replace")
        except OSError:
            continue
        if "run_s22_sweep" in cmd or "bench.py" in cmd or "run_mp2_s22" in cmd:
            # CPU-backend runs (launched with PALLAS_AXON_POOL_IPS unset so
            # the axon sitecustomize never dials the relay) hold no chip
            # claim and can run concurrently with on-device work
            try:
                with open(f"/proc/{entry}/environ", "rb") as f:
                    environ = f.read()
                if b"PALLAS_AXON_POOL_IPS=" not in environ:
                    continue
            except OSError:
                pass
            pids.append(int(entry))
    return pids


def main():
    import os

    deadline = time.time() + 5400.0
    busy = _other_chip_users()
    while busy and time.time() < deadline:
        print(f"# waiting for other chip users {busy} "
              "(single-tenant relay)", file=sys.stderr)
        time.sleep(30.0)
        busy = _other_chip_users()
    if busy:
        # NEVER proceed concurrently: round-3's end-of-round bench did, and
        # both processes died (RESOURCE_EXHAUSTED here, garbage ~1e13
        # energies in the sweep).  A reduced CPU number beats a corrupted
        # TPU one.
        print(f"# chip still held by {busy} after wait; falling back to "
              "reduced CPU bench", file=sys.stderr)
        env = {k: v for k, v in os.environ.items()
               if not k.startswith("PALLAS_AXON")}
        env["JAX_PLATFORMS"] = "cpu"
        import subprocess

        raise SystemExit(subprocess.run(
            [sys.executable, os.path.abspath(__file__), "4"],
            env=env).returncode)

    if not _device_available():
        # fall back to a reduced CPU run so the round still records a
        # benchmark line instead of hanging on the dead relay
        print("# TPU unreachable (relay probe timed out); rerunning reduced "
              "bench on CPU", file=sys.stderr)
        env = {k: v for k, v in os.environ.items()
               if not k.startswith("PALLAS_AXON")}
        env["JAX_PLATFORMS"] = "cpu"
        nw = "4" if (W50 or NW > 4) else str(NW)
        import subprocess

        raise SystemExit(subprocess.run(
            [sys.executable, os.path.abspath(__file__), nw], env=env).returncode)

    import jax

    from juliachem_jl_tpu import basis, molecule, io
    from juliachem_jl_tpu.basis import CalculationBasisSets
    from juliachem_jl_tpu.models import rhf
    from juliachem_jl_tpu.utils.timings import JCTC

    if W50:
        spec = io.read_input("/root/reference/example_inputs/w50.json")
        mol = molecule.from_input_dict(spec.molecule)
        primary_name = "cc-pVDZ"
        scf_flags = {"scf_type": "rhf" if CONV else "df", "niter": 60,
                     "dele": 1e-8, "rmsd": 1e-6, "guess": "sad"}
    else:
        spec = io.read_input(
            "/root/reference/example_inputs/Water/7_6/water_7.6.json")
        symbols = spec.molecule["symbols"][: 3 * NW]
        geometry = spec.molecule["geometry"][: 9 * NW]
        mol = molecule.from_input_dict(
            {"symbols": symbols, "geometry": geometry, "molecular_charge": 0}
        )
        primary_name = "6-31+G*"
        # convergence matches the reference w7.6 benchmark's own keywords
        # (example_inputs/Water/7_6/water_7.6.json: dele=1.0, rmsd=2e-5)
        scf_flags = {"scf_type": "rhf" if CONV else "df", "niter": 50,
                     "dele": 1.0, "rmsd": 2e-5, "guess": "sad"}
        if NW >= 32 and not CONV:
            # hours-long B builds must survive TPU VM recycles: cache the
            # folded B + screen on disk and resume past the build
            scf_flags["df_b_cache"] = f"runs/w{NW}_B"
        if NW >= 48 and not CONV:
            # the w64-class B is ~50 GB and every B-sized relay transfer
            # runs at d2h 16 MB/s; f32 storage halves build/fold/stream
            # bytes at a deterministic ~1e-5 Eh DF fixed-point shift
            scf_flags["df_b_dtype"] = "f32"
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        bsets = CalculationBasisSets(
            basis.build(mol, primary_name),
            basis.build_auxiliary(mol, "cc-pVTZ-JKFIT", primary_name),
        )
    print(
        f"# bench: {'w50' if W50 else f'{NW} waters'}, "
        f"nbf={bsets.primary.nbf}, naux={bsets.auxiliary.nbf}, "
        f"device={jax.devices()[0].platform}",
        file=sys.stderr,
    )

    t0 = time.time()
    res = rhf.energy(mol, bsets, scf_flags)
    total = time.time() - t0
    timings = res["Timings"].timings
    pref = JCTC.fock_time + "-"
    iters = sorted(int(k[len(pref):]) for k in timings if k.startswith(pref))
    fock_times = {i: timings[f"{pref}{i}"] for i in iters}
    f32_iters = {i for i in iters if f"fock_f32-{i}" in timings}
    # drop iteration 1 (compile + B build amortization); report the f64
    # steady state as the headline (the mixed-precision f32 warm-up phase is
    # faster and would flatter a blended mean)
    steady = [i for i in iters[1:]] if len(iters) > 2 else iters

    def _steady_mean(vals):
        # each precision phase's first iteration compiles its own kernels
        # (30-60 s/kernel through the remote relay); exclude compile spikes
        # by dropping values > 2x the phase median when enough samples exist
        if len(vals) >= 3:
            med = float(np.median(vals))
            kept = [v for v in vals if v <= 2.0 * med]
            if kept:
                vals = kept
        return float(np.mean(vals)) if vals else float("nan")

    f64_steady = [fock_times[i] for i in steady if i not in f32_iters]
    f32_phase = [fock_times[i] for i in steady if i in f32_iters]
    fock_per_iter = _steady_mean(f64_steady if f64_steady
                                 else list(fock_times.values()))

    if W50:
        # the north-star config has no committed reference wall time
        # (BASELINE.md: w50 goldens/logs absent from the snapshot) -> record
        # the absolute number; vs_baseline deliberately null
        out = {
            "metric": (("rhf" if CONV else "df_rhf")
                       + "_w50_ccpvdz_time_to_1e-8_s"),
            "value": round(total, 1),
            "unit": "s",
            "vs_baseline": None,
            "fock_s_per_iter_f64_steady": round(fock_per_iter, 4),
            "iterations": res["Iterations"],
            "converged": bool(res["Converged?"]),
        }
    elif NW == 64:
        # the direct same-system headline: reference w7.6 total benchmark
        # time 2316.0 s (112-thread Skylake, BASELINE.md) vs our DF
        # time-to-converged at the reference's own convergence keywords
        out = {
            "metric": "rhf_w7.6_time_to_converged_s_631+Gstar",
            "value": round(total, 1),
            "unit": "s",
            "vs_baseline": round(2316.0 / total, 3),
            "algorithm": ("conventional-direct" if CONV else "df"),
            "iterations": res["Iterations"],
            "converged": bool(res["Converged?"]),
        }
    else:
        ref_scaled = REF_SECONDS_PER_ITER_W64 * (NW / 64.0) ** 2
        out = {
            "metric": f"df_rhf_fock_build_s_per_iter_w{NW}_631+Gstar",
            "value": round(fock_per_iter, 4),
            "unit": "s",
            "vs_baseline": round(ref_scaled / fock_per_iter, 3),
            "f64_steady_iters": len(f64_steady),
            "f32_phase_s_per_iter": (round(_steady_mean(f32_phase), 4)
                                     if f32_phase else None),
        }
    out["platform"] = jax.devices()[0].platform
    out["nw"] = "w50" if W50 else NW  # lets artifact writers reject a
    # reduced CPU-fallback run masquerading under a big-NW label
    print(
        f"# E={res['Energy']:.8f} converged={res['Converged?']} "
        f"iters={res['Iterations']} total={total:.1f}s fock/iter={fock_per_iter:.3f}s",
        file=sys.stderr,
    )
    setup_keys = [JCTC.two_center_time, JCTC.three_center_time, JCTC.B_time,
                  JCTC.screening_time, JCTC.H_time, JCTC.guess_time]
    setup = {k: round(timings.get(k, 0.0), 2) for k in setup_keys}
    print(f"# setup: {setup}", file=sys.stderr)
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump({"headline": out, "total_s": total, "timings": timings},
                  f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
