"""Dense factorization caches — the TPU stand-in for cached SuperLU.

The reference's single hottest pattern is "factor a sparse matrix once
with splu, reuse the triangular solves thousands of times" (SURVEY.md
SS2 row 10, SS3.3-3.4). TPUs have no sparse LU; for the moderate state
sizes of this workload (64 .. ~10k dofs) the idiomatic replacement is a
DENSE factorization computed once on the MXU and reused as batched
triangular solves — O(n^2) per solve, MXU-bound, trivially batched over
RHS columns and scenarios. For larger n, solvers/krylov.py provides the
matrix-free path behind the same `apply` contract.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("lu", "piv"),
    meta_fields=(),
)
@dataclass(frozen=True)
class LUSolver:
    """Cached dense LU of a (possibly batched) square matrix.

    lu:  (..., n, n) packed LU factors.
    piv: (..., n) pivot indices.
    `apply` solves A x = b for b (..., n) or (..., n, k); leading batch
    dims of the factorization broadcast against the RHS via vmap at the
    call site (keep factors unbatched here; batch with jax.vmap(LUSolver.apply)).
    """

    lu: jax.Array
    piv: jax.Array

    @staticmethod
    def factor(a: jax.Array) -> "LUSolver":
        lu, piv = jax.scipy.linalg.lu_factor(a)
        return LUSolver(lu, piv)

    def apply(self, b: jax.Array) -> jax.Array:
        squeeze = b.ndim == 1
        if squeeze:
            b = b[:, None]
        x = jax.scipy.linalg.lu_solve((self.lu, self.piv), b)
        return x[:, 0] if squeeze else x


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("chol",),
    meta_fields=(),
)
@dataclass(frozen=True)
class CholeskySolver:
    """Cached dense Cholesky (SPD systems: mass matrices, Gram blocks)."""

    chol: jax.Array  # lower triangular

    @staticmethod
    def factor(a: jax.Array) -> "CholeskySolver":
        return CholeskySolver(jnp.linalg.cholesky(a))

    def apply(self, b: jax.Array) -> jax.Array:
        squeeze = b.ndim == 1
        if squeeze:
            b = b[:, None]
        y = jax.scipy.linalg.solve_triangular(self.chol, b, lower=True)
        x = jax.scipy.linalg.solve_triangular(
            self.chol.T, y, lower=False
        )
        return x[:, 0] if squeeze else x
