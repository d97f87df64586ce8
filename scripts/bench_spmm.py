#!/usr/bin/env python
"""Decide the SpMM kernel per operator BY MEASUREMENT (VERDICT r2
weak 5): time einsum-ELL vs Pallas windowed-dense vs Pallas
windowed-ELL on each config-3 operator (A^T-shifted, M, J, J^T) at the
matfree solver's working batch widths, on the real chip. Writes
SPMM_r05.json; pack_for_backend's dispatch policy cites this artifact.
The r4 harness returned full result arrays, so its recorded numbers
were dominated by tunnel readback (see the in-loop comment).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_spmm.py [refinement] [batch]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from optconpy_tpu import utils
    from optconpy_tpu.models.cylinder import cylinder_setup
    from optconpy_tpu.ops.pallas_spmm import (
        pack_windowed_dense,
        rcm_permutation,
        windowed_dense_spmm,
    )
    from optconpy_tpu.ops.sparse import ell_from_scipy

    utils.setup()
    refinement = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 104
    iters = 30
    dtype = jnp.float32

    t0 = time.time()
    np_ops, sys64, cond = cylinder_setup(re=60.0, refinement=refinement)
    log(f"setup {time.time() - t0:.1f}s")
    dt = 0.01
    m_sp = np_ops["M"].tocsr()
    at_sp = (np_ops["A"].T - m_sp / (2 * dt)).tocsr()
    j_sp = np_ops["J"].tocsr()
    # RCM ordering of the velocity space (the matfree cache's layout).
    perm = rcm_permutation(np_ops["M"], at_sp)
    ops = {
        "At_shifted": at_sp[perm][:, perm].tocsr(),
        "M": m_sp[perm][:, perm].tocsr(),
        "J": j_sp[:, perm].tocsr(),
        "Jt": sp.csr_matrix(j_sp[:, perm].T),
    }

    rng = np.random.default_rng(0)
    results = {}
    for name, a in ops.items():
        n_rows, n_cols = a.shape
        x = jnp.asarray(rng.standard_normal((n_cols, b)), dtype)
        y_ref = np.asarray(a @ np.asarray(x, np.float64))
        scale = np.abs(y_ref).max()
        packs = {}
        try:
            packs["windowed_dense"] = (
                pack_windowed_dense(a, dtype=np.float32),
                windowed_dense_spmm,
            )
        except Exception as e:  # noqa: BLE001
            log(f"{name}: windowed_dense pack failed: {e}")
        # windowed_ell was DELETED in r4: its Mosaic gather rule
        # rejected every production shape on the real chip (see the
        # recorded lowering_errors in SPMM_r04.json runs).
        ell = ell_from_scipy(a, pad_to=8, dtype=np.float32)
        packs["einsum_ell"] = (ell, lambda p, x: p.matmat(x))

        row = {}
        errors = {}
        for kind, (pack, apply_fn) in packs.items():
            try:
                y = np.asarray(apply_fn(pack, x))
                rel = np.abs(y - y_ref).max() / scale
                assert rel < 1e-5, (name, kind, rel)

                # Harness notes (r5 correction): the r4 harness
                # returned the full (m, b) accumulator, so every
                # timing sample paid a ~8 MB host readback through
                # the ~10-30 MB/s axon tunnel — SPMM_r04's 18.8
                # ms/apply was ~75% readback, not kernel time. The
                # loop now reduces to ONE scalar on device (sum keeps
                # every output element live so XLA cannot dead-code
                # or slice-prune the apply) and x stays loop-variant
                # so nothing hoists.
                @jax.jit
                def loop(x, pack=pack, apply_fn=apply_fn):
                    def body(i, acc):
                        return acc + jnp.sum(
                            apply_fn(pack, x + 0.0 * i)
                        )

                    return jax.lax.fori_loop(
                        0, iters, body, jnp.zeros((), x.dtype)
                    )

                np.asarray(loop(x))  # compile + run (np barrier)
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    np.asarray(loop(x))
                    ts.append(time.perf_counter() - t0)
                per_ms = min(ts) / iters * 1e3
                row[kind] = round(per_ms, 4)
                log(
                    f"{name:11s} {kind:15s} {per_ms:8.3f} ms  "
                    f"rel={rel:.1e}"
                )
            except Exception as e:  # noqa: BLE001
                # A kernel that cannot LOWER on the real chip is a
                # measurement too (windowed_ell's Mosaic gather rule
                # rejects these shapes) — record it, don't die.
                errors[kind] = f"{type(e).__name__}: {str(e)[:200]}"
                log(f"{name:11s} {kind:15s} FAILED: {errors[kind][:80]}")
        best = min(row, key=row.get)
        results[name] = {
            "shape": list(a.shape), "nnz": int(a.nnz),
            "ms_per_apply": row, "best": best,
            "lowering_errors": errors,
        }
        log(f"{name}: best = {best}")

    out = {
        "problem": f"cylinder_re60_ref{refinement}",
        "batch": b,
        "iters": iters,
        "operators": results,
        "device": str(jax.devices()[0].device_kind),
    }
    # Accumulate runs (one key per shape class) so the artifact covers
    # every production regime in one file.
    import os

    path = "/root/repo/SPMM_r05.json"
    acc = {}
    if os.path.exists(path):
        with open(path) as f:
            acc = json.load(f)
        if "runs" not in acc:
            acc = {"runs": {f"ref{acc['problem'][-1]}_b{acc['batch']}": acc}}
    else:
        acc = {"runs": {}}
    acc["runs"][f"ref{refinement}_b{b}"] = out
    with open(path, "w") as f:
        json.dump(acc, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
