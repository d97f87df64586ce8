"""Fused Pallas TPU kernel for the batched convection N(v)v.

The XLA lowering of ConvKernel.conv_full_batch (fem/device_conv.py)
materializes every intermediate in HBM — measured 7.2 of the 9.9
ms/step of the fused bench rollout at (n=4396, B=1024), 4.5 ms of it
pure memory movement (the per-element contraction lowers to (36, 12)
batched GEMMs, <3% MXU utilization, so the op is bandwidth-bound end
to end).

This kernel keeps the contraction pipeline in VMEM. Mosaic's gather
support is take_along_axis-shaped only, so the element-local dof
GATHER and the final dof SCATTER-sum stay in XLA (simple row gathers
with the batch riding the lanes); everything between — the 12-term
reference contraction W[e,(i,k)] = T0[e,(i,k),(j,b)] v[b][e,j] and the
12-term combine out[a][e,i] = W[e,(i,k)] v[a][e,k] — runs as unrolled
VPU fused multiply-adds on (E, Bt) tiles with NO intermediate leaving
VMEM. Layouts are chosen so the kernel needs zero reshapes/relayouts:

  v_loc:  (6, nt_pad, B)   per local node j (gathered outside);
  T0:     (12, nt_pad, 36) lanes = (i*6+k), t0p[(j,b), e, (i,k)];
  out:    (6, nt_pad, B)   per local node i, per component.

Element padding rows compute zeros (T0 padding is zero) and the
scatter sentinel points at a padded element row.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_conv_tensor(t0: np.ndarray, e_block: int):
    """Repack T0 (nt, 6, 6, 6, 2) -> (12, nt_pad, 36) with
    t0p[j*2 + b, e, i*6 + k] = T0[e, i, j, k, b]; nt_pad rounds nt + 1
    up to e_block (>= one zero pad element for the scatter sentinel)."""
    nt = t0.shape[0]
    nt_pad = _round_up(nt + 1, e_block)
    t0p = np.zeros((12, nt_pad, 36), dtype=np.float32)
    # (e,i,j,k,b) -> [(j,b), e, (i,k)]
    t0p[:, :nt] = np.transpose(t0, (2, 4, 0, 1, 3)).reshape(12, nt, 36)
    return t0p, nt_pad


def pad_dofs(tri_dofs: np.ndarray, nt_pad: int) -> np.ndarray:
    """Pad the (nt, 6) element dof map to nt_pad rows (dof 0; the
    padded elements' T0 is zero so they contribute nothing)."""
    nt = tri_dofs.shape[0]
    out = np.zeros((nt_pad, 6), dtype=np.int32)
    out[:nt] = tri_dofs
    return out


def remap_scatter_slots(
    scatter_slots: np.ndarray, nt: int, nt_pad: int
) -> np.ndarray:
    """Old flat slots e*6 + i (sentinel nt*6) -> node-major i*nt_pad+e
    (sentinel row nt: the zero padded element in node block 0)."""
    s = np.asarray(scatter_slots, dtype=np.int64)
    e = s // 6
    i = s % 6
    return (i * nt_pad + e).astype(np.int32)


@partial(
    jax.jit, static_argnames=("e_block", "b_tile", "interpret")
)
def conv_element_blocks(
    vxs: jax.Array,  # (6, nt_pad, B_pad) x-component at local nodes
    vys: jax.Array,  # (6, nt_pad, B_pad)
    t0p: jax.Array,  # (12, nt_pad, 36)
    e_block: int = 64,
    b_tile: int = 256,
    interpret: bool = False,
):
    """Per-element convection results (outx, outy), each
    (6, nt_pad, B_pad) in node-major layout."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, nt_pad, b_pad = vxs.shape
    b_tile = min(b_tile, b_pad)
    n_eb = nt_pad // e_block
    n_bt = b_pad // b_tile

    grid_spec = pl.GridSpec(
        grid=(n_bt, n_eb),
        in_specs=[
            pl.BlockSpec(
                (6, e_block, b_tile), lambda bt, eb: (0, eb, bt),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (6, e_block, b_tile), lambda bt, eb: (0, eb, bt),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (12, e_block, 36), lambda bt, eb: (0, eb, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (6, e_block, b_tile), lambda bt, eb: (0, eb, bt),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (6, e_block, b_tile), lambda bt, eb: (0, eb, bt),
                memory_space=pltpu.VMEM,
            ),
        ),
    )

    def kernel(vx_ref, vy_ref, t0_ref, outx_ref, outy_ref):
        vxj = [vx_ref[j] for j in range(6)]  # 6 x (E, Bt)
        vyj = [vy_ref[j] for j in range(6)]
        # W[(i,k)][e, :] = sum_{j,b} T0[(j,b), e, (i,k)] v[b][e, :]
        w = []
        for m in range(36):
            acc = t0_ref[0, :, m][:, None] * vxj[0]
            acc = acc + t0_ref[1, :, m][:, None] * vyj[0]
            for j in range(1, 6):
                acc = acc + t0_ref[2 * j, :, m][:, None] * vxj[j]
                acc = acc + t0_ref[2 * j + 1, :, m][:, None] * vyj[j]
            w.append(acc)
        # out[a][i][e, :] = sum_k W[(i,k)][e, :] v[a][e at k, :]
        for i in range(6):
            ox = w[6 * i] * vxj[0]
            oy = w[6 * i] * vyj[0]
            for k in range(1, 6):
                ox = ox + w[6 * i + k] * vxj[k]
                oy = oy + w[6 * i + k] * vyj[k]
            outx_ref[i] = ox.astype(outx_ref.dtype)
            outy_ref[i] = oy.astype(outy_ref.dtype)

    flops = 2 * nt_pad * b_pad * 36 * (12 + 2)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((6, nt_pad, b_pad), vxs.dtype),
            jax.ShapeDtypeStruct((6, nt_pad, b_pad), vxs.dtype),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=int(
                2 * 6 * nt_pad * b_pad * 4 * 2
                + 12 * nt_pad * 36 * 4 * n_bt
            ),
            transcendentals=0,
        ),
    )(vxs, vys, t0p)


def conv_full_batch_pallas(
    v_full_t: jax.Array,  # (2*ns, B)
    t0p: jax.Array,  # (12, nt_pad, 36)
    dofs: jax.Array,  # (nt_pad, 6) int32
    slots_nodemajor: jax.Array,  # (ns, k_s) remapped scatter slots
    ns: int,
    e_block: int = 64,
    b_tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Full fused-conv evaluation: (2ns, B) -> (2ns, B)."""
    b = v_full_t.shape[1]
    b_pad = _round_up(b, min(b_tile, _round_up(b, 128)))
    b_pad = _round_up(b_pad, 128)
    vx = v_full_t[:ns]
    vy = v_full_t[ns:]
    if b_pad != b:
        pad = ((0, 0), (0, b_pad - b))
        vx = jnp.pad(vx, pad)
        vy = jnp.pad(vy, pad)
    # XLA-side gather (batch rides the lanes; whole-row gathers).
    vxs = jnp.stack([jnp.take(vx, dofs[:, j], axis=0) for j in range(6)])
    vys = jnp.stack([jnp.take(vy, dofs[:, j], axis=0) for j in range(6)])
    outx, outy = conv_element_blocks(
        vxs, vys, t0p, e_block=e_block, b_tile=b_tile,
        interpret=interpret,
    )
    nt_pad = dofs.shape[0]
    ox = outx.reshape(6 * nt_pad, b_pad)
    oy = outy.reshape(6 * nt_pad, b_pad)
    # XLA-side dof scatter: k_s-term gather-sum.
    k_s = slots_nodemajor.shape[1]
    accx = jnp.take(ox, slots_nodemajor[:, 0], axis=0)
    accy = jnp.take(oy, slots_nodemajor[:, 0], axis=0)
    for s in range(1, k_s):
        accx = accx + jnp.take(ox, slots_nodemajor[:, s], axis=0)
        accy = accy + jnp.take(oy, slots_nodemajor[:, s], axis=0)
    return jnp.concatenate([accx[:, :b], accy[:, :b]], axis=0)
