#!/usr/bin/env python
"""On-TPU parity + perf for the fused Pallas convection kernel
(ops/pallas_conv.py) vs the XLA ConvKernel lowering at bench shapes
(cylinder ref1, B=1024) — VERDICT r2 item 1's mandatory on-chip check
(the interpret-mode test in tests/test_quad_conv.py runs the kernel on
the CPU interpreter only). Asserts parity < 5e-6 relative and writes
PARITY_CONV_r04.json. Timing runs inside a lax.scan of K applications
per dispatch: a single call through the TPU tunnel costs ~400 ms of
dispatch latency, which would swamp the ~10 ms kernel. Run:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/parity_fused_conv.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


K = 50  # kernel applications per timed dispatch


def main():
    import jax
    import jax.numpy as jnp

    from optconpy_tpu import utils
    from optconpy_tpu.fem.device_conv import ConvKernel, FusedConvKernel
    from optconpy_tpu.models.cylinder import cylinder_setup

    utils.setup()
    dtype = jnp.float32
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    np_ops, sys64, cond = cylinder_setup(re=100.0, refinement=1)
    fused = FusedConvKernel.build(np_ops["full"], cond, dtype=dtype)
    conv = fused.ref
    assert fused._use_pallas(), "must run on the TPU backend"
    ns = conv.ns
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((2 * ns, b)), dtype)

    f_ref = jax.jit(conv.conv_full_batch)
    f_pal = jax.jit(fused.conv_full_batch)
    a = np.asarray(f_ref(v))
    c = np.asarray(f_pal(v))
    rel = float(np.abs(a - c).max() / np.abs(a).max())
    log(f"B={b} ns={ns} nt={conv.tri_dofs.shape[0]} parity={rel:.3e}")
    assert rel < 5e-6, rel

    def loop(f):
        @jax.jit
        def run(x):
            def body(y, _):
                z = f(y)
                return z / (1e-30 + jnp.max(jnp.abs(z))), None
            out, _ = jax.lax.scan(body, x, None, length=K)
            return out
        return run

    ms = {}
    for name, f in (("xla", loop(f_ref)), ("pallas", loop(f_pal))):
        np.asarray(f(v))  # compile
        times = []
        for _ in range(5):
            t0 = time.time()
            np.asarray(f(v))
            times.append(time.time() - t0)
        ms[name] = min(times) / K * 1e3
        log(f"{name}: {ms[name]:.3f} ms/call (scan K={K}, best of 5)")

    out = {
        "kernel": "pallas_conv_element_blocks",
        "problem": "cylinder_re100_ref1",
        "batch": b,
        "max_rel_dev_vs_xla": rel,
        "xla_ms_per_call": round(ms["xla"], 3),
        "pallas_ms_per_call": round(ms["pallas"], 3),
        "speedup": round(ms["xla"] / ms["pallas"], 2),
        "device": str(jax.devices()[0].device_kind),
    }
    with open("/root/repo/PARITY_CONV_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
