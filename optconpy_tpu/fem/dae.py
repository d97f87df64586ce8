"""Constrained (index-2 DAE) system container: the Stokes/NSE setting.

    M v' = A v + J^T p + B u + f,    J v = 0,    y = C v

on the condensed free-dof velocity space (fem/condense.py). The
divergence constraint is never eliminated on device; saddle-point
solves keep iterates in ker J implicitly, mirroring the reference's
app_prj_via_sadpnt design (SURVEY.md SS2 row 5: the Leray projector
is never formed).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.sparse import ELL, ell_from_scipy


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("mass", "stiff", "stiff_t", "jmat", "jmat_t", "b", "c",
                 "fv"),
    meta_fields=("n", "n_p", "m_in", "p_out"),
)
@dataclass(frozen=True)
class DAESystem:
    """Index-2 DAE descriptor system on the free velocity dofs.

    mass, stiff: (n, n) ELL;  jmat: (n_p, n) ELL divergence (pinned
    pressure removed);  b: (n, m_in);  c: (p_out, n);  fv: (n,)
    constant forcing (BC contributions + body force).
    """

    mass: ELL
    stiff: ELL
    stiff_t: ELL
    jmat: ELL
    jmat_t: ELL
    b: jax.Array
    c: jax.Array
    fv: jax.Array
    n: int
    n_p: int
    m_in: int
    p_out: int

    def dense(self):
        return (
            self.mass.todense(),
            self.stiff.todense(),
            self.jmat.todense(),
        )

    def astype(self, dtype) -> "DAESystem":
        return DAESystem(
            self.mass.astype(dtype),
            self.stiff.astype(dtype),
            self.stiff_t.astype(dtype),
            self.jmat.astype(dtype),
            self.jmat_t.astype(dtype),
            self.b.astype(dtype),
            self.c.astype(dtype),
            self.fv.astype(dtype),
            self.n,
            self.n_p,
            self.m_in,
            self.p_out,
        )


def dae_from_scipy(m_sp, a_sp, j_sp, b, c, fv=None, pad_to: int = 4):
    import numpy as np

    n = m_sp.shape[0]
    n_p = j_sp.shape[0]
    if fv is None:
        fv = np.zeros(n)
    return DAESystem(
        mass=ell_from_scipy(m_sp, pad_to=pad_to),
        stiff=ell_from_scipy(a_sp, pad_to=pad_to),
        stiff_t=ell_from_scipy(a_sp.T, pad_to=pad_to),
        jmat=ell_from_scipy(j_sp, pad_to=pad_to),
        jmat_t=ell_from_scipy(j_sp.T, pad_to=pad_to),
        b=jnp.asarray(b),
        c=jnp.asarray(c),
        fv=jnp.asarray(fv),
        n=n,
        n_p=n_p,
        m_in=b.shape[1],
        p_out=c.shape[0],
    )
