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
  * WindowedELL — minimal traffic: per-slot row gathers from the VMEM
    window (jnp.take along sublanes), data (m, k) + cols only.

Both kernels share the same pack → apply contract and are validated
against the ops/sparse.py einsum-ELL oracle; `spmm` dispatches with a
segment-sum/einsum fallback on non-TPU backends.
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


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("data", "cols_rel", "w_start"),
    meta_fields=("shape", "tile_m", "w"),
)
@dataclass(frozen=True)
class WindowedELL:
    """Padded-ELL with per-row-tile relative columns.

    data:     (m_pad, k) values; cols_rel: (m_pad, k) int32 columns
              RELATIVE to the row tile's window start (padding slots
              point at relative column 0 with value 0).
    w_start:  (n_tiles,) int32 window starts.
    """

    data: jax.Array
    cols_rel: jax.Array
    w_start: jax.Array
    shape: tuple
    tile_m: int
    w: int

    @property
    def dtype(self):
        return self.data.dtype

    def matmat(self, x: jax.Array) -> jax.Array:
        return windowed_ell_spmm(self, x)

    def astype(self, dtype) -> "WindowedELL":
        return WindowedELL(
            self.data.astype(dtype), self.cols_rel, self.w_start,
            self.shape, self.tile_m, self.w,
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


def pack_windowed_ell(
    a, tile_m: int = 128, w_pad: int = 256, k_pad: int = 8,
    dtype=np.float32,
) -> WindowedELL:
    """Host-side pack of a scipy sparse matrix into WindowedELL."""
    import scipy.sparse as sp

    a = sp.csr_matrix(a)
    a.sum_duplicates()
    m, n = a.shape
    starts, w = _tile_windows(a, tile_m, w_pad)
    n_pad_cols = _round_up(n + w, 8)
    clip = max(n_pad_cols - w, 0)
    starts = np.minimum(starts, clip - clip % 8)
    m_pad = _round_up(max(m, 1), tile_m)
    row_nnz = np.diff(a.indptr)
    k = _round_up(max(int(row_nnz.max()) if m else 1, 1), k_pad)
    data = np.zeros((m_pad, k), dtype=dtype)
    cols_rel = np.zeros((m_pad, k), dtype=np.int32)
    rows_flat = np.repeat(np.arange(m), row_nnz)
    slot_flat = np.arange(a.nnz) - np.repeat(a.indptr[:-1], row_nnz)
    data[rows_flat, slot_flat] = a.data
    cols_rel[rows_flat, slot_flat] = (
        a.indices - starts[rows_flat // tile_m]
    ).astype(np.int32)
    return WindowedELL(
        data=jnp.asarray(data),
        cols_rel=jnp.asarray(cols_rel),
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


@partial(jax.jit, static_argnames=("interpret",))
def windowed_ell_spmm(
    a: WindowedELL, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """Y = A @ X via the windowed-gather ELL Pallas kernel."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, n = a.shape
    xp, b, squeeze = _pad_x(x, n, a.w, 128)
    m_pad, k = a.data.shape
    n_tiles = m_pad // a.tile_m
    bp = xp.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # X off-core
            pl.BlockSpec(
                (a.tile_m, k), lambda t, ws: (t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (a.tile_m, k), lambda t, ws: (t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (a.tile_m, bp), lambda t, ws: (t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((a.w, bp), xp.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def kernel(ws_ref, x_hbm, data_ref, cols_ref, out_ref, xw, sem):
        ti = pl.program_id(0)
        start = pl.multiple_of(ws_ref[ti], 8)  # pack-time aligned
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, a.w), :], xw, sem
        )
        dma.start()
        dma.wait()
        window = xw[:]
        acc = jnp.zeros((a.tile_m, bp), jnp.float32)
        for j in range(k):
            rows = jnp.take(window, cols_ref[:, j], axis=0)
            acc = acc + data_ref[:, j][:, None].astype(jnp.float32) * rows
        out_ref[:] = acc.astype(out_ref.dtype)

    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, bp), x.dtype),
        interpret=interpret,
    )(a.w_start, xp, a.data, a.cols_rel)
    y = y[:m, :b]
    return y[:, 0] if squeeze else y


def pack_windowed(a, kind: str = "dense", **kw):
    """Pack a scipy matrix for the requested kernel kind."""
    if kind == "dense":
        return pack_windowed_dense(a, **kw)
    if kind == "ell":
        return pack_windowed_ell(a, **kw)
    raise ValueError(f"unknown windowed pack kind: {kind}")


def pack_for_backend(a_sp, dtype, kind: str = "auto", w_cap: int = 4096):
    """Pack a scipy matrix for on-device SpMM: windowed-dense on TPU,
    einsum-ELL elsewhere (and whenever the measured column window
    exceeds w_cap — the per-tile X window lives in VMEM, ~16 MB scoped
    limit). kind: 'auto' | 'windowed' | 'ell'. 'auto' respects an
    explicitly pinned default DEVICE (the test harness pins CPU while
    the axon TPU plugin keeps default_backend() == 'tpu')."""
    if kind == "auto":
        from ..utils.runtime import effective_platform

        kind = "windowed" if effective_platform() == "tpu" else "ell"
    if kind == "windowed":
        pack = pack_windowed_dense(a_sp, dtype=np.dtype(dtype))
        if pack.w <= w_cap:
            return pack
    from .sparse import ell_from_scipy

    return ell_from_scipy(a_sp, pad_to=8, dtype=np.dtype(dtype))


def spmm(a, x: jax.Array) -> jax.Array:
    """Dispatch SpMM: windowed Pallas kernels on TPU, einsum-ELL else.

    `a` may be a WindowedDense / WindowedELL (Pallas) or an
    ops.sparse.ELL (einsum oracle/fallback).
    """
    if isinstance(a, (WindowedDense, WindowedELL)):
        from ..utils.runtime import effective_platform

        if effective_platform() == "tpu":
            return a.matmat(x)
        # Interpreter fallback keeps CPU tests meaningful.
        if isinstance(a, WindowedDense):
            return windowed_dense_spmm(a, x, interpret=True)
        return windowed_ell_spmm(a, x, interpret=True)
    return a @ x
