"""On-device convection N(v)v — gather / einsum / scatter, no assembly.

The reference re-assembles the convection vector through DOLFIN every
transient step (SURVEY.md SS3.4 get_convvec, an L0 FFI crossing). Here
the geometry is baked into the per-element tensor T0 at setup
(fem/taylor_hood.py convection_tensor) and each evaluation is a static
gather + batched tensor contraction + segment-sum scatter — fully
jit/vmap-safe, MXU/VPU-friendly, zero host involvement.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("t0", "tri_dofs", "free", "dir_values"),
    meta_fields=("ns", "n_free"),
)
@dataclass(frozen=True)
class ConvKernel:
    """Device-resident convection evaluator with BC bookkeeping.

    t0: (nt, 6, 6, 6, 2) per-element tensor;
    tri_dofs: (nt, 6) scalar P2 dofs;
    free: (n_free,) indices of free dofs in the FULL velocity vector;
    dir_values: (2*ns,) full-length vector holding Dirichlet values at
        constrained dofs and 0 at free dofs (scatter base).
    """

    t0: jax.Array
    tri_dofs: jax.Array
    free: jax.Array
    dir_values: jax.Array
    ns: int
    n_free: int

    @staticmethod
    def build(ops: dict, cond, dtype=jnp.float64) -> "ConvKernel":
        from .taylor_hood import convection_tensor

        space = ops["space"]
        t0 = convection_tensor(ops)
        ns = space.n_scalar
        dir_values = np.zeros(2 * ns)
        dir_values[cond.dirichlet] = cond.g
        return ConvKernel(
            t0=jnp.asarray(t0, dtype),
            tri_dofs=jnp.asarray(space.tri_dofs, jnp.int32),
            free=jnp.asarray(cond.free, jnp.int32),
            dir_values=jnp.asarray(dir_values, dtype),
            ns=ns,
            n_free=len(cond.free),
        )

    def expand(self, v_inner: jax.Array) -> jax.Array:
        """Lift inner (free-dof) velocity to the full dof vector."""
        return self.dir_values.at[self.free].set(v_inner)

    def conv_full(self, v_full: jax.Array) -> jax.Array:
        """N(v)v on the full dof set: (2ns,) -> (2ns,) weak-form vector."""
        ns = self.ns
        v2 = v_full.reshape(2, ns)
        v_loc = v2[:, self.tri_dofs].transpose(1, 2, 0)  # (nt, 6, 2)
        out_loc = jnp.einsum(
            "eijkb,ejb,eka->eia", self.t0, v_loc, v_loc
        )  # (nt, 6, 2)
        flat_idx = self.tri_dofs.reshape(-1)  # (nt*6,)
        out = jnp.zeros((2, ns), v_full.dtype)
        out = out.at[0].add(
            jax.ops.segment_sum(
                out_loc[:, :, 0].reshape(-1), flat_idx, num_segments=ns
            )
        )
        out = out.at[1].add(
            jax.ops.segment_sum(
                out_loc[:, :, 1].reshape(-1), flat_idx, num_segments=ns
            )
        )
        return out.reshape(-1)

    def conv_inner(self, v_inner: jax.Array) -> jax.Array:
        """N(v)v restricted to free dofs, BC values included in v."""
        v_full = self.expand(v_inner)
        return self.conv_full(v_full)[self.free]

    def linearized_dense(
        self, v_full: jax.Array, include_l2: bool = True
    ) -> jax.Array:
        """Dense linearized convection L1(v) (+ L2(v)) on FULL dofs.

        Device-side mirror of fem.taylor_hood.convection_matrices for
        online re-linearization inside the MPC loop (no host crossing):
        L1 u = (v.grad)u (component-diagonal), L2 u = (u.grad)v
        (component-coupling). Returns (2ns, 2ns); restrict to free dofs
        with mat[free][:, free] at the call site.
        """
        ns = self.ns
        nt = self.tri_dofs.shape[0]
        v2 = v_full.reshape(2, ns)
        v_loc = v2[:, self.tri_dofs].transpose(1, 2, 0)  # (nt, 6, 2)
        rows = jnp.broadcast_to(
            self.tri_dofs[:, :, None], (nt, 6, 6)
        )
        cols = jnp.broadcast_to(
            self.tri_dofs[:, None, :], (nt, 6, 6)
        )
        out = jnp.zeros((2 * ns, 2 * ns), v_full.dtype)
        # L1[(i,a),(k,a)] = sum_{j,b} T0[e,i,j,k,b] v_loc[e,j,b]
        l1_loc = jnp.einsum("eijkb,ejb->eik", self.t0, v_loc)
        out = out.at[rows, cols].add(l1_loc)
        out = out.at[rows + ns, cols + ns].add(l1_loc)
        if include_l2:
            # L2[(i,a),(j,b)] = sum_k T0[e,i,j,k,b] v_loc[e,k,a]
            l2_loc = jnp.einsum("eijkb,eka->eijab", self.t0, v_loc)
            for a_c in range(2):
                for b_c in range(2):
                    out = out.at[rows + a_c * ns, cols + b_c * ns].add(
                        l2_loc[..., a_c, b_c]
                    )
        return out

    def astype(self, dtype) -> "ConvKernel":
        return ConvKernel(
            self.t0.astype(dtype),
            self.tri_dofs,
            self.free,
            self.dir_values.astype(dtype),
            self.ns,
            self.n_free,
        )
