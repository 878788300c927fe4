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
                argv = f.read().split(b"\0")
        except OSError:
            continue
        # any python process that inherited PALLAS_AXON_POOL_IPS may dial
        # the relay (the axon sitecustomize connects on first jax use even
        # under JAX_PLATFORMS=cpu); CPU-side runs are launched with the var
        # stripped (env -u PALLAS_AXON_POOL_IPS) and hold no chip claim.
        # Match the interpreter itself (argv[0]), not shell wrappers whose
        # -c strings merely mention python.  The long-lived .tpu_init.py
        # supervisor holds the var but never runs ops concurrently with a
        # granted claim.
        exe = os.path.basename(argv[0].decode(errors="replace"))
        cmd = b" ".join(argv).decode(errors="replace")
        if not exe.startswith("python") or "tpu_init" in cmd:
            continue
        try:
            with open(f"/proc/{entry}/environ", "rb") as f:
                if b"PALLAS_AXON_POOL_IPS=" not in f.read():
                    continue
        except OSError:
            continue
        pids.append(int(entry))
    return pids


def _xla_cache_warm() -> bool:
    """Heuristic cold-VM detector: a recycled VM loses ~/.cache/jchem_xla
    and every kernel pays a 30-60 s relay compile once."""
    import os

    root = os.path.join(os.path.expanduser("~"), ".cache", "jchem_xla")
    try:
        total = sum(e.stat().st_size for e in os.scandir(root)
                    if e.is_file())
        return total > 5.0e7
    except OSError:
        return False


def _b_cached(nw: int) -> bool:
    import os

    return (os.path.exists(f"runs/w{nw}_B_B.npy")
            and os.path.exists(f"runs/w{nw}_B_screen.npz"))


def _estimate_cost_s(nw: int) -> float:
    """Conservative wall estimate for one DF bench at NW waters on the
    relay chip.  Build numbers are round-4/5 measurements (BENCH_W16_R04:
    1267 s full warm build pre-3c-redesign; the redesign targets ~half);
    the ~N^2 scaling extrapolates between measured points."""
    build = {4: 60, 8: 200, 12: 420, 16: 750}.get(
        nw, 750.0 * (nw / 16.0) ** 2)
    scf = {4: 25, 8: 50, 12: 75, 16: 110}.get(nw, 110.0 * (nw / 16.0) ** 2)
    cost = scf + (0.0 if _b_cached(nw) else build)
    if not _xla_cache_warm():
        # cold compile cache: every SCF/fold/3c kernel recompiles through
        # the remote relay (30-60 s each)
        cost = cost * 1.3 + 450.0
    return cost


def _pick_nw(requested: int, remaining_s: float):
    """Largest NW from the downshift ladder whose conservative estimate
    fits 75% of the remaining budget.  VERDICT r4 #1: a bench that only
    completes when a human watches it is not a bench — SOME honest TPU
    headline with a true nw label must always print before the clock."""
    ladder = [nw for nw in (requested, 12, 8, 4) if nw <= requested]
    for nw in ladder:
        est = _estimate_cost_s(nw)
        if est <= 0.75 * remaining_s:
            if nw != requested:
                print(f"# bench: downshifted w{requested} -> w{nw} "
                      f"(estimate {est:.0f}s vs budget {remaining_s:.0f}s, "
                      f"B_cached={_b_cached(nw)}, "
                      f"xla_warm={_xla_cache_warm()})", file=sys.stderr,
                      flush=True)
            return nw
    return ladder[-1]


def main():
    import os

    t_start = time.time()
    # hard wall budget for the whole bench (driver end-of-round timeouts
    # killed BENCH_r03/r04 mid-build; now the bench plans to finish INSIDE
    # the clock: NW downshift + SCF wall_deadline + cached B)
    budget = float(os.environ.get("JCHEM_BENCH_BUDGET_S", "1200"))
    deadline = t_start + budget
    cpu_backend = os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
    busy = [] if cpu_backend else _other_chip_users()
    while busy and time.time() < deadline - 600.0:
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

    nw = NW
    if W50:
        spec = io.read_input("/root/reference/example_inputs/w50.json")
        mol = molecule.from_input_dict(spec.molecule)
        primary_name = "cc-pVDZ"
        scf_flags = {"scf_type": "rhf" if CONV else "df", "niter": 60,
                     "dele": 1e-8, "rmsd": 1e-6, "guess": "sad"}
    else:
        if not CONV and os.environ.get("JCHEM_BENCH_NO_DOWNSHIFT") != "1":
            nw = _pick_nw(NW, deadline - time.time())
        spec = io.read_input(
            "/root/reference/example_inputs/Water/7_6/water_7.6.json")
        symbols = spec.molecule["symbols"][: 3 * nw]
        geometry = spec.molecule["geometry"][: 9 * nw]
        mol = molecule.from_input_dict(
            {"symbols": symbols, "geometry": geometry, "molecular_charge": 0}
        )
        primary_name = "6-31+G*"
        # convergence matches the reference w7.6 benchmark's own keywords
        # (example_inputs/Water/7_6/water_7.6.json: dele=1.0, rmsd=2e-5)
        scf_flags = {"scf_type": "rhf" if CONV else "df", "niter": 50,
                     "dele": 1.0, "rmsd": 2e-5, "guess": "sad"}
        if not CONV:
            # B builds must survive TPU VM recycles AND make the next bench
            # of the same NW skip its most expensive phase entirely: cache
            # the folded B + screen on disk at EVERY size (VERDICT r4 #1)
            scf_flags["df_b_cache"] = f"runs/w{nw}_B"
            # S/T/V cache: the OEI build is the dominant setup cost on a
            # warm rerun (w32: 1166 s vs ~1 s load)
            scf_flags["oei_cache"] = f"runs/w{nw}_B"
            # stop the SCF before an iteration that would blow the budget;
            # partial per-iteration timings still yield the headline mean
            scf_flags["wall_deadline"] = deadline - 60.0
            # post-convergence Fock timing reps (deadline-guarded in
            # models/rhf.py): the headline mean rests on >=8 f64 samples
            # instead of the 3-5 iterations a fast SCF leaves
            scf_flags["bench_fock_reps"] = 8
        if nw >= 32 and not CONV:
            # the composed large-system chain (VERDICT r4 #2): f32 B storage
            # halves every B-sized relay transfer (d2h measured 16 MB/s) and
            # runs the metric fold as a native-f32 MXU matmul instead of
            # emulated f64 (~2 h for the w32 fold, measured round 5) — at a
            # deterministic ~1e-5 Eh DF fixed-point shift, far inside this
            # bench's own convergence keywords (dele=1.0, rmsd=2e-5)
            scf_flags["df_b_dtype"] = "f32"
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        bsets = CalculationBasisSets(
            basis.build(mol, primary_name),
            basis.build_auxiliary(mol, "cc-pVTZ-JKFIT", primary_name),
        )
    print(
        f"# bench: {'w50' if W50 else f'{nw} waters'}, "
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
    # post-convergence timing reps are FULL builds dispatched back-to-back
    # (no host DIIS/eigensolve interleave): on the async relay they absorb
    # pipeline-drain latency and are a different quantity from the in-SCF
    # steady iterations this metric has tracked since round 2 — exclude
    # them from the headline, report their mean separately
    rep_iters = {i for i in iters if f"fock_rep-{i}" in timings}
    iters = [i for i in iters if i not in rep_iters]
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
    elif nw == 64:
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
        ref_scaled = REF_SECONDS_PER_ITER_W64 * (nw / 64.0) ** 2
        out = {
            "metric": f"df_rhf_fock_build_s_per_iter_w{nw}_631+Gstar",
            "value": round(fock_per_iter, 4),
            "unit": "s",
            "vs_baseline": round(ref_scaled / fock_per_iter, 3),
            "f64_steady_iters": len(f64_steady),
            "f32_phase_s_per_iter": (round(_steady_mean(f32_phase), 4)
                                     if f32_phase else None),
        }
        if rep_iters:
            out["full_fock_s_per_iter"] = round(_steady_mean(
                [fock_times[i] for i in sorted(rep_iters)]), 4)
            out["full_fock_reps"] = len(rep_iters)
    if scf_flags.get("df_b_dtype") == "f32":
        # B values stored f32 (transfer/fold halving); per-iteration J/K
        # algebra still promotes to f64 — deterministic ~1e-5 Eh shift
        out["df_b_dtype"] = "f32"
    out["platform"] = jax.devices()[0].platform
    out["nw"] = "w50" if W50 else nw  # lets artifact writers reject a
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
