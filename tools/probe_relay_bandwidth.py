"""Measure axon-relay host<->device transfer bandwidth and small-op latency.

The w7.6 (w64) same-system north-star can only run on this single chip via
the DF stream mode (B resident on host, streamed per f64 iteration): B at
w64 is ~40-90 GB and the conventional path's host index streams are
multi-TB.  Whether streaming is hours or days is purely a function of the
relay's sustained h2d bandwidth.  Writes RELAY_BANDWIDTH.json.

Round-3 probe bugs fixed here (VERDICT r3 "weak" #5):
  * d2h timed repeated np.asarray on ONE jax Array — jax caches the host
    value after the first conversion, so reps 2..N were free and the probe
    recorded a fictional 22 TB/s.  Now each rep converts a DISTINCT device
    buffer (derived on-device, synced before the timer starts).
  * x64 was never enabled, so the "f64" h2d and matmul rows silently ran
    f32 (matmul_f64_TFLOPs = 22.4 ~ the bf16 rate).  x64 is now enabled
    before any jnp call.
  * values are sanity-gated: a transfer rate above the physically plausible
    ceiling refuses to serialize (callers gate the w64 attempt on these).
"""
import json
import time

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

# anything beyond PCIe gen5 x16-class sustained rates through a network
# relay is instrument error, not signal
PLAUSIBLE_GBPS_MAX = 100.0


def _gated(gbps: float) -> float | str:
    if not (0.0 < gbps <= PLAUSIBLE_GBPS_MAX):
        return f"implausible: {gbps:.1f} GB/s (probe error)"
    return round(gbps, 3)


def main():
    dev = jax.devices()[0]
    out = {"platform": dev.platform, "device": str(dev)}

    # small-op round-trip latency (dispatch + sync)
    x = jnp.ones((8, 8))
    (x @ x).block_until_ready()
    t0 = time.time()
    n = 20
    for _ in range(n):
        x = (x @ x) / 8.0
    x.block_until_ready()
    out["small_op_roundtrip_ms"] = round((time.time() - t0) / n * 1e3, 2)

    # h2d sustained bandwidth (256 MB f64 slabs, 8 reps, distinct host
    # buffers so no layer can dedupe the payload)
    rng = np.random.default_rng(0)
    a = rng.random((4096, 8192))  # 256 MiB f64
    jnp.asarray(a).block_until_ready()  # warm the path
    reps = 8
    hosts = [a + i for i in range(reps)]
    t0 = time.time()
    for h in hosts:
        jnp.asarray(h).block_until_ready()
    dt = time.time() - t0
    out["h2d_GBps"] = _gated(reps * a.nbytes / dt / 1e9)

    # d2h sustained bandwidth: distinct device buffers per rep (jax caches
    # the host value of an already-converted Array, so converting the same
    # one N times times only the first copy)
    base = jnp.asarray(a)
    devs = [(base + float(i)).block_until_ready() for i in range(reps)]
    np.asarray(base)  # warm the transfer path
    t0 = time.time()
    for d in devs:
        np.asarray(d)
    dt = time.time() - t0
    out["d2h_GBps"] = _gated(reps * a.nbytes / dt / 1e9)
    del devs, base

    # f32 transfer rates (the stream-mode f32 phase halves bytes)
    a32 = a.astype(np.float32)
    jnp.asarray(a32).block_until_ready()
    hosts32 = [a32 + np.float32(i) for i in range(reps)]
    t0 = time.time()
    for h in hosts32:
        jnp.asarray(h).block_until_ready()
    dt = time.time() - t0
    out["h2d_f32_GBps"] = _gated(reps * a32.nbytes / dt / 1e9)
    base32 = jnp.asarray(a32)
    devs32 = [(base32 + np.float32(i)).block_until_ready() for i in range(reps)]
    np.asarray(base32)
    t0 = time.time()
    for d in devs32:
        np.asarray(d)
    dt = time.time() - t0
    out["d2h_f32_GBps"] = _gated(reps * a32.nbytes / dt / 1e9)
    del devs32, base32

    # matmul rate by precision: decides whether a hand-rolled double-f32
    # (compensated) J/K beats XLA's emulated-f64 for the steady-state SCF
    # iterations.  x64 is on, so the f64 row is real emulated-f64.
    n_mm = 4096
    flops = 2.0 * n_mm**3
    for name, dt_, prec in (
        ("bf16", jnp.bfloat16, None),
        ("f32_default", jnp.float32, "default"),
        ("f32_highest", jnp.float32, "highest"),
        ("f64", jnp.float64, None),
    ):
        x = jnp.asarray(np.random.default_rng(1).random((n_mm, n_mm)), dt_)
        f = jax.jit(lambda a_, b_: jnp.matmul(a_, b_, precision=prec))
        try:
            f(x, x).block_until_ready()
            t0 = time.time()
            reps_mm = 4
            for _ in range(reps_mm):
                y = f(x, x)
            y.block_until_ready()
            dt_s = (time.time() - t0) / reps_mm
            out[f"matmul_{name}_TFLOPs"] = round(flops / dt_s / 1e12, 2)
        except Exception as exc:  # keep the probe alive on a failing mode
            out[f"matmul_{name}_TFLOPs"] = f"error: {str(exc)[:80]}"

    print(json.dumps(out))
    with open("RELAY_BANDWIDTH.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
