#!/usr/bin/env python
"""Measure the ATTAINABLE matmul roofline per precision tier on the
chip (VERDICT r3 weak 7: bench.py's f32-'highest' roofline was the
hardcoded folklore peak/6 — replace it with a measured number).

Times a bench-shaped dense GEMM chain ((4096, 4096) @ (4096, 1024),
the MXU-saturating regime) under each jax.default_matmul_precision
tier and writes ROOFLINE_r04.json; bench.py reads the artifact for its
MFU denominators when present.

Axon-runtime timing rules respected here: block_until_ready returns
before execution (bench.py:172 comment), so the barrier is a HOST
materialization of a scalar reduction of the chain output; the ~0.4 s
tunnel dispatch latency is cancelled by differencing two chain lengths
(rate = d_flops / d_time).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_roofline.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

M, K, N = 4096, 4096, 1024
REPS_LO, REPS_HI = 64, 256


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from optconpy_tpu import utils

    utils.setup()
    dev = jax.devices()[0]
    log(f"device: {dev.platform} / {dev.device_kind}")
    rng = np.random.default_rng(0)
    a32 = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    x32 = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)

    def make_chain(reps, dtype):
        scale = jnp.asarray(1.0 / np.sqrt(K), dtype)

        @jax.jit
        def chain(a_, x_):
            def body(y, _):
                return (a_ @ y) * scale, None

            y, _ = jax.lax.scan(body, x_, None, length=reps)
            return jnp.sum(y)  # scalar: cheap host fetch barrier

        return chain

    def rate_tflops(a_, x_, dtype):
        t_at = {}
        for reps in (REPS_LO, REPS_HI):
            chain = make_chain(reps, dtype)
            float(np.asarray(chain(a_, x_)))  # compile + warm
            times = []
            for _ in range(5):
                t0 = time.time()
                s = float(np.asarray(chain(a_, x_)))
                times.append(time.time() - t0)
            assert np.isfinite(s)
            t_at[reps] = min(times)
        d_flops = 2.0 * M * K * N * (REPS_HI - REPS_LO)
        d_t = t_at[REPS_HI] - t_at[REPS_LO]
        return d_flops / max(d_t, 1e-9) / 1e12, t_at

    out = {
        "shape": [M, K, N],
        "reps": [REPS_LO, REPS_HI],
        "method": "scan-chain scalar-reduced, dispatch-cancelled diff",
        "device": str(dev.device_kind),
    }
    tiers = {}
    for prec in ("highest", "high", "default"):
        with jax.default_matmul_precision(prec):
            tf, t_at = rate_tflops(a32, x32, jnp.float32)
        tiers[prec] = {
            "tflops": round(tf, 1),
            "t_lo_s": round(t_at[REPS_LO], 4),
            "t_hi_s": round(t_at[REPS_HI], 4),
        }
        log(f"{prec:8s}: {tf:8.1f} TFLOP/s "
            f"(t{REPS_LO}={t_at[REPS_LO]:.3f}s t{REPS_HI}={t_at[REPS_HI]:.3f}s)")

    a16 = a32.astype(jnp.bfloat16)
    x16 = x32.astype(jnp.bfloat16)
    tf, t_at = rate_tflops(a16, x16, jnp.bfloat16)
    tiers["bf16"] = {
        "tflops": round(tf, 1),
        "t_lo_s": round(t_at[REPS_LO], 4),
        "t_hi_s": round(t_at[REPS_HI], 4),
    }
    log(f"bf16    : {tf:8.1f} TFLOP/s")

    out["tiers"] = tiers
    with open("/root/repo/ROOFLINE_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
