#!/usr/bin/env python
"""Validate + time the Pallas windowed SpMM kernels vs the einsum-ELL
fallback on the config-3 (refinement-2 cylinder) operators.

Run: PYTHONPATH=/root/repo python scripts/bench_spmm.py [refinement]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from optconpy_tpu import utils
    from optconpy_tpu.models.cylinder import cylinder_setup
    from optconpy_tpu.ops.pallas_spmm import (
        pack_windowed_dense,
        pack_windowed_ell,
        rcm_permutation,
        windowed_dense_spmm,
        windowed_ell_spmm,
    )
    from optconpy_tpu.ops.sparse import ell_from_scipy

    utils.setup()
    refinement = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    iters = 30
    dtype = jnp.float32

    t0 = time.time()
    np_ops, sys64, cond = cylinder_setup(re=60.0, refinement=refinement)
    log(f"setup {time.time() - t0:.1f}s")
    a_sp = np_ops["A"].tocsr()
    perm = rcm_permutation(np_ops["M"], a_sp)
    ap = a_sp[perm][:, perm].tocsr()
    n = ap.shape[0]
    log(f"n={n} nnz={ap.nnz}")

    wd = pack_windowed_dense(ap, dtype=np.float32)
    we = pack_windowed_ell(ap, dtype=np.float32)
    ell = ell_from_scipy(ap, pad_to=8, dtype=np.float32)
    log(
        f"windows: w={wd.w} tiles={wd.blocks.shape[0]} "
        f"dense blocks {wd.blocks.size * 4 / 1e6:.0f} MB, "
        f"ell k={we.data.shape[1]}"
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, b)), dtype)
    y_ref = np.asarray(ap @ np.asarray(x, np.float64))

    def timed(name, fn):
        try:
            y = np.asarray(fn(x))
        except Exception as e:  # noqa: BLE001 - report and continue
            log(f"{name}: FAILED {type(e).__name__}: {e}")
            return None
        rel = np.abs(y - y_ref).max() / np.abs(y_ref).max()
        # time with a fori_loop of repeated applies to amortize dispatch
        @jax.jit
        def many(x):
            def body(i, acc):
                return acc + fn(x + acc * 0)

            return jax.lax.fori_loop(
                0, iters, body, jnp.zeros_like(fn(x))
            )

        many(x).block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            many(x).block_until_ready()
            ts.append(time.perf_counter() - t0)
        per = min(ts) / iters * 1e3
        gbs = 0.0
        log(f"{name}: {per:8.3f} ms/apply  rel_err={rel:.2e}")
        return per

    timed("einsum_ell", lambda x: ell.matmat(x))
    timed("windowed_dense", lambda x: windowed_dense_spmm(wd, x))
    timed("windowed_ell", lambda x: windowed_ell_spmm(we, x))


if __name__ == "__main__":
    main()
