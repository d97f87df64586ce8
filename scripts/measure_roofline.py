#!/usr/bin/env python
"""Measure the ATTAINABLE matmul roofline per precision tier on the
chip (VERDICT r3 weak 7: bench.py's f32-'highest' roofline was the
hardcoded folklore peak/6 — replace it with a measured number).

Times a bench-shaped dense GEMM chain ((4096, 4096) @ (4096, 1024),
the MXU-saturating regime) under each jax.default_matmul_precision
tier and writes ROOFLINE_r04.json; bench.py reads the artifact for its
MFU denominators when present.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_roofline.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

M, K, N = 4096, 4096, 1024
REPS = 16  # chained GEMMs per timed program (amortize dispatch)


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
    a = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    flops = 2.0 * M * K * N * REPS

    out = {"shape": [M, K, N], "reps": REPS, "device": str(dev.device_kind)}
    tiers = {}
    for prec in ("highest", "high", "default"):
        with jax.default_matmul_precision(prec):

            @jax.jit
            def chain(a_, x_):
                y = x_
                for _ in range(REPS):
                    y = a_ @ y
                    # rescale so the chain stays finite
                    y = y * jnp.asarray(1.0 / np.sqrt(K), jnp.float32)
                return y

            jax.block_until_ready(chain(a, x))  # compile
            times = []
            for _ in range(5):
                t0 = time.time()
                jax.block_until_ready(chain(a, x))
                times.append(time.time() - t0)
        t = min(times)
        tf = flops / t / 1e12
        tiers[prec] = {"s": round(t, 4), "tflops": round(tf, 2)}
        log(f"{prec:8s}: {t:.4f}s -> {tf:.1f} TFLOP/s")

    # bf16 pure (inputs cast): the hardware ceiling reference point.
    a16 = a.astype(jnp.bfloat16)
    x16 = x.astype(jnp.bfloat16)

    @jax.jit
    def chain16(a_, x_):
        y = x_
        for _ in range(REPS):
            y = a_ @ y
            y = y * jnp.asarray(1.0 / np.sqrt(K), jnp.bfloat16)
        return y

    jax.block_until_ready(chain16(a16, x16))
    times = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(chain16(a16, x16))
        times.append(time.time() - t0)
    t = min(times)
    tiers["bf16"] = {"s": round(t, 4), "tflops": round(flops / t / 1e12, 2)}
    log(f"bf16    : {t:.4f}s -> {flops / t / 1e12:.1f} TFLOP/s")

    out["tiers"] = tiers
    with open("/root/repo/ROOFLINE_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
