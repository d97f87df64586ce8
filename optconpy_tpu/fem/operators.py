"""Frozen operator pytrees — the FEM -> device boundary.

Mirrors the reference's matrix-caching boundary (SURVEY.md SS3.5): FEM
assembly happens offline on CPU (numpy/scipy), producing a frozen pytree
of static-sparsity operators; on-device code only ever sees arrays. The
reference reaches this boundary via dolfin_to_sparrays + load_or_comp
(SURVEY.md SS2 rows 3, 8); here the fem/ modules produce these
containers directly.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.sparse import ELL, ell_from_scipy


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("mass", "stiff", "stiff_t", "b", "c"),
    meta_fields=("n", "m_in", "p_out"),
)
@dataclass(frozen=True)
class LTISystem:
    """Unconstrained LTI descriptor system  M v' = A v + B u,  y = C v.

    mass:    M  (n, n) SPD, padded-ELL.
    stiff:   A  (n, n) stable (Hurwitz w.r.t. M pencil), padded-ELL.
    stiff_t: A^T as its own ELL (adjoint/costate solves).
    b:       (n, m_in) dense input map.
    c:       (p_out, n) dense output map.
    """

    mass: ELL
    stiff: ELL
    stiff_t: ELL
    b: jax.Array
    c: jax.Array
    n: int
    m_in: int
    p_out: int

    def dense(self) -> tuple[jax.Array, jax.Array]:
        """Densified (M, A) for direct factorizations on small problems."""
        return self.mass.todense(), self.stiff.todense()

    def astype(self, dtype) -> "LTISystem":
        return LTISystem(
            self.mass.astype(dtype),
            self.stiff.astype(dtype),
            self.stiff_t.astype(dtype),
            self.b.astype(dtype),
            self.c.astype(dtype),
            self.n,
            self.m_in,
            self.p_out,
        )


def lti_from_scipy(m_sp, a_sp, b, c, pad_to: int = 4) -> LTISystem:
    """Build an LTISystem from scipy sparse M, A and dense numpy B, C."""
    n = m_sp.shape[0]
    return LTISystem(
        mass=ell_from_scipy(m_sp, pad_to=pad_to),
        stiff=ell_from_scipy(a_sp, pad_to=pad_to),
        stiff_t=ell_from_scipy(a_sp.T, pad_to=pad_to),
        b=jnp.asarray(b),
        c=jnp.asarray(c),
        n=n,
        m_in=b.shape[1],
        p_out=c.shape[0],
    )
