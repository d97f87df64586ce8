#!/usr/bin/env python
"""Sub-stage timing of the batch-last convection kernel on TPU."""
from __future__ import annotations

import sys as _sys
import time

import numpy as np

ITERS = 30


def main():
    import jax
    import jax.numpy as jnp

    from optconpy_tpu import utils
    from optconpy_tpu.fem.device_conv import ConvKernel
    from optconpy_tpu.models.cylinder import cylinder_setup

    utils.setup()
    dtype = jnp.float32
    np_ops, sys64, cond = cylinder_setup(re=100.0, refinement=1)
    conv = ConvKernel.build(np_ops["full"], cond, dtype=dtype)
    n = conv.n_free
    ns = conv.ns
    nt = conv.tri_dofs.shape[0]
    k_s = conv.scatter_slots.shape[1]
    print(f"n={n} ns={ns} nt={nt} k_s={k_s}", file=_sys.stderr)

    B = 1024
    rng = np.random.default_rng(0)
    vb = jnp.asarray(rng.standard_normal((B, n)), dtype)
    flat = conv.tri_dofs.reshape(-1)
    t0t = conv.t0

    # Pre-build stage inputs once.
    base = jnp.zeros((2 * ns, B), dtype)
    v_full_t = conv.dir_values[:, None] + base.at[conv.free].set(vb.T)
    v2 = v_full_t.reshape(2, ns, B)
    v_loc = v2[:, flat].reshape(2, nt, 6, B)
    w = jnp.einsum("eijkb,bejB->eikB", t0t, v_loc)

    def out_unrolled(vl):
        # The shipped kernel's second contraction (conv_full_batch):
        # unrolled multiply-adds, avoiding the (2, nt, 6, 6, B) einsum
        # broadcast materialization.
        acc = w[None, :, :, 0, :] * vl[:, :, None, 0, :]
        for k in range(1, 6):
            acc = acc + w[None, :, :, k, :] * vl[:, :, None, k, :]
        return acc

    out_loc = out_unrolled(v_loc)
    out_flat = jnp.concatenate(
        [out_loc.reshape(2, nt * 6, B), jnp.zeros((2, 1, B), dtype)], axis=1
    )

    def scanner(op, x):
        @jax.jit
        def run(x):
            def body(c, _):
                out = op(c)
                # data-depend on out so the op isn't DCE'd
                return c + out.ravel()[0] * 1e-20, None

            c, _ = jax.lax.scan(body, x, None, length=ITERS)
            return c

        out = run(x)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    stages = {
        "noop": (lambda x: x, vb),
        "expand_T": (
            lambda x: conv.dir_values[:, None]
            + jnp.zeros((2 * ns, B), dtype).at[conv.free].set(x.T),
            vb,
        ),
        "gather_vloc": (
            lambda x: x.reshape(2, ns, B)[:, flat], v_full_t),
        "einsum_w": (
            lambda x: jnp.einsum("eijkb,bejB->eikB", t0t, x), v_loc),
        # Shipped kernel path (unrolled) vs the einsum alternative that
        # conv_full_batch deliberately avoids — both labeled explicitly.
        "out_unrolled": (out_unrolled, v_loc),
        "out_einsum_alt": (
            lambda x: jnp.einsum("eikB,aekB->aeiB", w, x), v_loc),
        "scatter_sum": (
            lambda x: x[:, conv.scatter_slots].sum(axis=2), out_flat),
        "free_gather_T": (lambda x: x[conv.free].T, v_full_t),
    }
    res = {}
    for name, (op, x) in stages.items():
        res[name] = scanner(op, x)
        print(f"  done {name}", file=_sys.stderr)
    for name, t in res.items():
        per = (t - res["noop"]) / ITERS * 1e3
        print(f"{name:16s} {per:8.3f} ms/iter", file=_sys.stderr)


if __name__ == "__main__":
    main()
