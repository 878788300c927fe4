"""Measure axon-relay host<->device transfer bandwidth and small-op latency.

The w7.6 (w64) same-system north-star can only run on this single chip via
the DF stream mode (B resident on host, streamed per f64 iteration): B at
w64 is ~40-90 GB and the conventional path's host index streams are
multi-TB.  Whether streaming is hours or days is purely a function of the
relay's sustained h2d bandwidth, which has never been measured directly.
Writes RELAY_BANDWIDTH.json.
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


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

    # h2d sustained bandwidth (256 MB f64 slabs, 8 reps)
    a = np.random.default_rng(0).random((4096, 8192))  # 256 MiB f64
    jnp.asarray(a).block_until_ready()  # warm the path
    t0 = time.time()
    reps = 8
    for _ in range(reps):
        jnp.asarray(a).block_until_ready()
    dt = time.time() - t0
    out["h2d_GBps"] = round(reps * a.nbytes / dt / 1e9, 3)

    # d2h sustained bandwidth
    b = jnp.asarray(a)
    b.block_until_ready()
    np.asarray(b)
    t0 = time.time()
    for _ in range(reps):
        np.asarray(b)
    dt = time.time() - t0
    out["d2h_GBps"] = round(reps * a.nbytes / dt / 1e9, 3)

    # f32 h2d (the stream-mode f32 phase halves bytes)
    a32 = a.astype(np.float32)
    jnp.asarray(a32).block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        jnp.asarray(a32).block_until_ready()
    dt = time.time() - t0
    out["h2d_f32_GBps"] = round(reps * a32.nbytes / dt / 1e9, 3)

    # matmul rate by precision: decides whether a hand-rolled double-f32
    # (compensated) J/K beats XLA's emulated-f64 for the steady-state SCF
    # iterations (f64 steady 0.97-4.0 s/iter vs f32 phase ~0.18 s at w16)
    n_mm = 4096
    flops = 2.0 * n_mm**3
    for name, dt, prec in (
        ("bf16", jnp.bfloat16, None),
        ("f32_default", jnp.float32, "default"),
        ("f32_highest", jnp.float32, "highest"),
        ("f64", jnp.float64, None),
    ):
        x = jnp.asarray(np.random.default_rng(1).random((n_mm, n_mm)), dt)
        f = jax.jit(lambda a, b: jnp.matmul(a, b, precision=prec))
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
