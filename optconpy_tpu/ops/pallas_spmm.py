"""Pallas TPU kernels for static-sparsity SpMM (SURVEY.md SS7 layer 1,
hard part 4).

The reference's hot kernel is SuperLU triangular solves on FEM sparsity
(SURVEY.md SS2 row 10); the TPU redesign replaces those with iterative
solvers whose only large-n primitive is SpMM against the frozen FEM
operators (ops/sparse.py ELL). XLA's lowering of the einsum-ELL form
materializes the (m, k, b) gather in HBM — at config-3 sizes that is
>100 MB of traffic per apply. These kernels exploit the PDE locality
instead: after a bandwidth-reducing (reverse Cuthill-McKee) reordering,
every 128-row tile of a FEM matrix touches a narrow contiguous column
WINDOW (measured <= 1024 of 15316 columns on the refinement-2 cylinder),
so each tile's multiply runs entirely in VMEM against one DMA'd window
of X:

  * WindowedDense — gather-free: each row tile is stored as a dense
    (tile_m, w) block; the tile multiply is ONE MXU matmul
    (tile_m, w) @ (w, b). Trades padding FLOPs (the MXU has them to
    spare) for zero irregular memory ops; HBM traffic = blocks + X
    windows + Y, independent of b's gather blowup.
The kernel is validated against the ops/sparse.py einsum-ELL oracle;
`spmm` dispatches with a segment-sum/einsum fallback on non-TPU
backends. A WindowedELL gather variant (per-slot jnp.take from the
VMEM window) existed through round 3 but was DELETED in round 4 by
measurement: its Mosaic gather rule rejects every production shape on
the real chip ("Shape mismatch in input, indices and output" at
refinement 1 AND 2 — recorded lowering_errors), so it only ever ran
under the CPU interpreter.

MEASUREMENT CORRECTION (r5, SPMM_r05.json): the r4 timing harness
returned full (m, b) result arrays, so every sample paid a ~8 MB host
readback through the ~10-30 MB/s axon tunnel — SPMM_r04's recorded
18.8 ms/apply for the refinement-2 At operator was ~75% readback. The
corrected scalar-reduction harness measures this kernel at 0.97
ms/apply there (einsum-ELL 2.8 ms). Within-run A/Bs across kernel
structures (VMEM-resident X, double-buffered DMA, pencil-fused
At+sigma*M, tile_m sweeps) all converge to a per-op floor of ~1.3-3
ms on this runtime that is insensitive to kernel design — the
performance lever at these sizes is OP COUNT (see
solvers/ns_inverse.py: the dense one-GEMM-per-solve tier), not
further sparse-kernel tuning.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def rcm_permutation(*mats) -> np.ndarray:
    """Reverse Cuthill-McKee ordering of the union pattern of `mats`.

    Host-side setup step: returns perm such that mat[perm][:, perm] has
    small per-tile column windows. Apply to the velocity dof set once,
    at the FEM -> device boundary (SURVEY.md SS3.5).
    """
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csg

    patt = None
    for m in mats:
        m = sp.csr_matrix(m)
        m = abs(m) + abs(m).T
        patt = m if patt is None else patt + m
    return np.asarray(
        csg.reverse_cuthill_mckee(patt.tocsr(), symmetric_mode=True)
    )


def sort_rows_by_window(csr) -> np.ndarray:
    """Row order sorting rows by their first nonzero column.

    For rectangular operators (J: pressure rows x velocity cols) whose
    column space was RCM-ordered: sorting rows geometrically shrinks the
    per-tile windows the same way RCM does for square operators.
    """
    import scipy.sparse as sp

    m = sp.csr_matrix(csr)
    first = np.full(m.shape[0], m.shape[1], dtype=np.int64)
    for i in range(m.shape[0]):
        lo, hi = m.indptr[i], m.indptr[i + 1]
        if hi > lo:
            first[i] = m.indices[lo:hi].min()
    return np.argsort(first, kind="stable")


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("blocks", "w_start"),
    meta_fields=("shape", "tile_m", "w"),
)
@dataclass(frozen=True)
class WindowedDense:
    """Row-tiled windowed-dense matrix.

    blocks:  (n_tiles, tile_m, w) dense values; block t holds rows
             [t*tile_m, (t+1)*tile_m) over columns
             [w_start[t], w_start[t] + w).
    w_start: (n_tiles,) int32 window starts (clipped so windows stay
             in-bounds of the column-padded X).
    shape:   logical (m, n).
    """

    blocks: jax.Array
    w_start: jax.Array
    shape: tuple
    tile_m: int
    w: int

    @property
    def dtype(self):
        return self.blocks.dtype

    def matmat(self, x: jax.Array) -> jax.Array:
        return windowed_dense_spmm(self, x)

    def astype(self, dtype) -> "WindowedDense":
        return WindowedDense(
            self.blocks.astype(dtype), self.w_start, self.shape,
            self.tile_m, self.w,
        )


def _tile_windows(csr, tile_m: int, w_pad: int):
    """Per-tile (start, width) column windows; returns (starts, w).

    Starts are aligned DOWN to multiples of 8 (f32 sublane tiling) so
    the kernels' dynamic window DMA slices are provably tile-aligned
    for Mosaic; w absorbs the <= 7 extra columns that costs.
    """
    m = csr.shape[0]
    n_tiles = _round_up(max(m, 1), tile_m) // tile_m
    starts = np.zeros(n_tiles, dtype=np.int64)
    width = 1
    for t in range(n_tiles):
        r0, r1 = t * tile_m, min((t + 1) * tile_m, m)
        lo, hi = csr.indptr[r0], csr.indptr[r1]
        if hi > lo:
            cmin = int(csr.indices[lo:hi].min())
            cmax = int(csr.indices[lo:hi].max())
            starts[t] = cmin - (cmin % 8)
            width = max(width, cmax - int(starts[t]) + 1)
    w = int(_round_up(width, w_pad))
    return starts, w


def pack_windowed_dense(
    a, tile_m: int = 128, w_pad: int = 256, dtype=np.float32
) -> WindowedDense:
    """Host-side pack of a scipy sparse matrix into WindowedDense."""
    import scipy.sparse as sp

    a = sp.csr_matrix(a)
    m, n = a.shape
    starts, w = _tile_windows(a, tile_m, w_pad)
    n_tiles = len(starts)
    # Clip starts so [start, start + w) fits the w-padded column space
    # (clip bound aligned down to 8 to preserve DMA tile alignment).
    n_pad = _round_up(n + w, 8)  # X rows padded by wrapper to >= n + w
    clip = max(n_pad - w, 0)
    starts = np.minimum(starts, clip - clip % 8)
    blocks = np.zeros((n_tiles, tile_m, w), dtype=dtype)
    coo = a.tocoo()
    t_idx = coo.row // tile_m
    blocks[t_idx, coo.row % tile_m, coo.col - starts[t_idx]] = coo.data
    return WindowedDense(
        blocks=jnp.asarray(blocks),
        w_start=jnp.asarray(starts.astype(np.int32)),
        shape=(m, n),
        tile_m=tile_m,
        w=w,
    )


def _pad_x(x: jax.Array, n: int, w: int, b_pad: int):
    """Zero-pad X to (>= n + w rows, lane-aligned cols)."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    b = x.shape[1]
    rows = _round_up(n + w, 8)
    cols = _round_up(b, b_pad)
    xp = jnp.zeros((rows, cols), x.dtype)
    xp = jax.lax.dynamic_update_slice(xp, x, (0, 0))
    return xp, b, squeeze


@partial(jax.jit, static_argnames=("interpret",))
def windowed_dense_spmm(
    a: WindowedDense, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """Y = A @ X via the windowed-dense Pallas kernel.

    Grid = (row tiles, column tiles): wide scenario batches tile the
    X/Y columns so the per-tile VMEM window (w x b_tile) stays well
    under the ~16 MB scoped limit even at w ~ 3k, B ~ 1k.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, n = a.shape
    xp, b, squeeze = _pad_x(x, n, a.w, 128)
    n_tiles = a.blocks.shape[0]
    bp = xp.shape[1]
    b_tile = min(bp, max(128, (4 * 1024 * 1024 // (4 * a.w)) // 128 * 128))
    while bp % b_tile:  # keep an integral column grid (bp % 128 == 0)
        b_tile -= 128
    n_bt = bp // b_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # bt fastest: the A block stays resident across column tiles.
        grid=(n_tiles, n_bt),
        in_specs=[
            # X stays off-core EXPLICITLY: with ANY the compiler has
            # placed wide-B X in VMEM (30 MB overflow + unprovable
            # dynamic-slice alignment at B=1024).
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, a.tile_m, a.w),
                lambda t, bt, ws: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (a.tile_m, b_tile), lambda t, bt, ws: (t, bt),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((a.w, b_tile), xp.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def kernel(ws_ref, x_hbm, blocks_ref, out_ref, xw, sem):
        ti = pl.program_id(0)
        bt = pl.program_id(1)
        # Window starts are 8-aligned at pack time (_tile_windows);
        # Mosaic needs the hint to prove the slice is tile-aligned.
        start = pl.multiple_of(ws_ref[ti], 8)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, a.w), pl.ds(bt * b_tile, b_tile)],
            xw, sem,
        )
        dma.start()
        dma.wait()
        out_ref[:] = jnp.dot(
            blocks_ref[0], xw[:], preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)

    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * a.tile_m, bp), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * a.tile_m * a.w * bp,
            bytes_accessed=(
                a.blocks.size * a.blocks.dtype.itemsize * n_bt
                + n_tiles * a.w * bp * xp.dtype.itemsize
                + n_tiles * a.tile_m * bp * xp.dtype.itemsize
            ),
            transcendentals=0,
        ),
    )(a.w_start, xp, a.blocks)
    y = y[:m, :b]
    return y[:, 0] if squeeze else y


def pack_for_backend(
    a_sp, dtype, kind: str = "auto", w_cap: int = 4096,
    batch_hint: int | None = None,
):
    """Pack a scipy matrix for on-device SpMM, choosing the kernel
    per-operator FROM MEASUREMENT — with the END-TO-END solve as the
    criterion, not single-op microbenches:

      * square operators and tall rectangulars (A^T class, mass, J^T):
        windowed-dense. Confirmed by the corrected r5 harness
        (SPMM_r05: ref2 At 0.97 vs 2.81 ms, M 0.95 vs 1.82, Jt 1.05
        vs 1.30) AND by the round-4 end-to-end config-3 FGMRES A/B
        (swapping the mass/J^T classes to einsum regressed the solve
        2x at q=40 working width);
      * wide rectangulars (J: pressure rows over velocity columns):
        einsum-ELL — J's windowed pack remote-compile-fails at
        refinement 2 (wide windows; re-confirmed r5) while einsum
        stays correct and fast there (1.0 ms, SPMM_r05).

    kind: 'auto' | 'windowed' | 'ell' ('auto' applies the table above
    on TPU, einsum-ELL elsewhere; it respects an explicitly pinned
    default DEVICE — the test harness pins CPU while the axon plugin
    keeps default_backend() == 'tpu'). w_cap caps the per-tile VMEM
    window (~16 MB scoped limit) as a final guard. batch_hint is
    accepted for API stability and currently unused (the end-to-end
    A/B showed the width-dependent policy it fed was wrong).
    """
    del batch_hint
    if kind == "auto":
        from ..utils.runtime import effective_platform

        if effective_platform() != "tpu":
            kind = "ell"
        else:
            import scipy.sparse as sp

            rows, cols = sp.csr_matrix(a_sp).shape
            kind = "ell" if rows < cols else "windowed"
    if kind == "windowed":
        pack = pack_windowed_dense(a_sp, dtype=np.dtype(dtype))
        if pack.w <= w_cap:
            return pack
    from .sparse import ell_from_scipy

    return ell_from_scipy(a_sp, pad_to=8, dtype=np.dtype(dtype))


def spmm(a, x: jax.Array) -> jax.Array:
    """Dispatch SpMM: windowed Pallas kernel on TPU, einsum-ELL else.

    `a` may be a WindowedDense (Pallas) or an ops.sparse.ELL (einsum
    oracle/fallback).
    """
    if isinstance(a, WindowedDense):
        from ..utils.runtime import effective_platform

        if effective_platform() == "tpu":
            return a.matmat(x)
        # Interpreter fallback keeps CPU tests meaningful.
        return windowed_dense_spmm(a, x, interpret=True)
    return a @ x
