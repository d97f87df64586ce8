"""Matrix-free shifted saddle-point solves — the genuinely-large-n path.

The reference factorizes every shifted saddle matrix with SuperLU
(SURVEY.md SS2 row 10, SS3.3 "dominates runtime"); the dense TPU
stand-ins (solvers/saddle.py, solvers/krylov.py reference LUs) cap out
near n+np ~ 17k because an (n+np)^2 factor is ~1.2 GB and the host
getrf at that size runs tens of minutes on the deploy VMs. This module
removes the dense factor entirely (SURVEY.md SS7 layer 3): every solve
is restarted FGMRES whose large-n primitives are

  * SpMM against the frozen FEM operators (Pallas windowed kernels on
    TPU, einsum-ELL fallback — ops/pallas_spmm.py), after a
    bandwidth-reducing RCM reordering of the velocity dofs,
  * a block-Jacobi velocity preconditioner: dense inverses of the
    RCM-ordered diagonal blocks of F_i = A^T + s_i M, applied as ONE
    batched (nb, B, B) @ (nb, B, q) MXU contraction per iteration
    (O(n B) memory per shift — 512 B/row vs n B/row for a dense factor),
  * a Cahouet-Chabard-style pressure Schur preconditioner: the Schur
    complement of [[F_i, J^T], [J, 0]] is S ~ -(1/s_i) L_p with
    L_p = J diag(M)^{-1} J^T (the mass-dominated limit; |s_i| >= 100
    for every DRE shift), so Shat^{-1} = -s_i L_p^{-1} with ONE dense
    (np, np) inverse shared by all shifts — np << n for Taylor-Hood.

NOTE the diag(M) in L_p: row-sum lumping of a P2 velocity mass matrix
is singular (vertex rows sum to ~0), so the diagonal is used instead.
Measured iteration counts on the refinement-2 cylinder DRE pencil
(n = 15316, f64 host prototype): 115/30/15 FGMRES iterations for the
smallest/median/largest shift at tol 1e-6 — against ZERO O(n^2) setup
or storage.

Contract parity: `solve(i, rhs)` / `solve_smw(i, u, v, rhs)` match
ShiftedLUCache/SaddleShiftedKrylovCache (consumed by riccati/lyap_adi);
`apply(rhs_v, rhs_p)` matches SaddleLU (consumed by mpc/nse_rollout).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas_spmm import spmm
from .krylov import fgmres


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pack_operator(
    a_sp, kind: str, dtype, w_cap: int = 4096,
    batch_hint: int | None = None,
):
    """Pack a scipy matrix for on-device SpMM — see
    ops.pallas_spmm.pack_for_backend for the MEASURED per-operator
    dispatch table (SPMM_r04.json); batch_hint is the expected SpMM
    column width (Krylov W width for the DRE cache, scenario batch for
    the transient stepper)."""
    from ..ops.pallas_spmm import pack_for_backend

    return pack_for_backend(
        a_sp, dtype, kind=kind, w_cap=w_cap, batch_hint=batch_hint
    )


def _block_jacobi_inverses(f_sp, block: int, n_pad: int) -> np.ndarray:
    """Dense inverses of the diagonal blocks of f_sp (padded rows get
    identity so the batched apply is shape-static)."""
    import scipy.sparse as sp

    f_csr = sp.csr_matrix(f_sp)
    n = f_csr.shape[0]
    nb = n_pad // block
    blocks = np.tile(np.eye(block), (nb, 1, 1))
    for t in range(nb):
        lo, hi = t * block, min((t + 1) * block, n)
        if lo >= n:
            break
        w = hi - lo
        blocks[t, :w, :w] = f_csr[lo:hi, :][:, lo:hi].toarray()
    return np.linalg.inv(blocks)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "at_pack", "m_pack", "j_pack", "jt_pack", "bj_inv", "lp_inv",
        "shifts", "schur_coeffs", "perm", "iperm", "p_perm", "p_iperm",
    ),
    meta_fields=("n", "n_p", "block", "m_krylov", "max_cycles", "tol"),
)
@dataclass(frozen=True)
class SaddleMatfreeCache:
    """Shifted saddle solves [[A^T + s_i M, J^T], [J, 0]] without any
    O((n+np)^2) factor — see module docstring for the scheme.

    All operator packs live in the RCM-permuted velocity ordering and
    the window-sorted pressure ordering; solve()/apply() permute rhs
    and solution at the boundary, so callers stay in original dof
    order (the DAESystem convention).
    """

    at_pack: object  # WindowedDense or ELL, (n, n), RCM-ordered
    m_pack: object  # (n, n)
    j_pack: object  # (n_p, n)
    jt_pack: object  # (n, n_p)
    bj_inv: jax.Array  # (n_shifts, nb, B, B) block-Jacobi inverses
    lp_inv: jax.Array  # (n_p, n_p) dense inverse of J diag(M)^-1 J^T
    shifts: jax.Array  # (n_shifts,) mass coefficients s_i of F_i
    schur_coeffs: jax.Array  # (n_shifts,) TOTAL signed mass coeff for S
    perm: jax.Array  # (n,) original -> RCM gather indices
    iperm: jax.Array  # (n,) RCM -> original gather indices
    p_perm: jax.Array  # (n_p,)
    p_iperm: jax.Array  # (n_p,)
    n: int
    n_p: int
    block: int
    m_krylov: int
    max_cycles: int
    tol: float

    @staticmethod
    def build(
        at_sp,
        m_sp,
        j_sp,
        shifts,
        schur_offset: float = 0.0,
        dtype=jnp.float32,
        block: int = 512,
        m_krylov: int = 30,
        max_cycles: int = 8,
        tol: float = 1e-6,
        kind: str = "auto",
        batch_hint: int | None = None,
    ) -> "SaddleMatfreeCache":
        """Host-side setup (scipy, f64) — O(nnz + n B^2 / B + np^3).

        at_sp: (n, n) scipy sparse A^T (the TRANSPOSED system operator,
            matching the ADI convention; pass A itself for forward
            saddle steps).
        shifts: concrete mass coefficients; F_i = at_sp + shifts[i] M.
        schur_offset: additive correction so the Schur scaling sees the
            TOTAL signed mass coefficient when at_sp already contains a
            hidden mass shift (the DRE passes -1/(2 dt) folded into
            Atil and offsets it back here).
        """
        import scipy.sparse as sp

        from ..ops.pallas_spmm import rcm_permutation, sort_rows_by_window

        at = sp.csr_matrix(at_sp)
        m = sp.csr_matrix(m_sp)
        j = sp.csr_matrix(j_sp)
        n = at.shape[0]
        n_p = j.shape[0]
        shifts_np = np.atleast_1d(np.asarray(shifts, dtype=np.float64))

        perm = rcm_permutation(m, at)
        iperm = np.argsort(perm)
        at_r = at[perm][:, perm].tocsr()
        m_r = m[perm][:, perm].tocsr()
        j_c = j[:, perm].tocsr()
        p_perm = sort_rows_by_window(j_c)
        p_iperm = np.argsort(p_perm)
        j_r = j_c[p_perm].tocsr()

        n_pad = _round_up(n, block)
        bj = np.stack([
            _block_jacobi_inverses(at_r + s * m_r, block, n_pad)
            for s in shifts_np
        ])

        # Pressure "Laplacian" L_p = J diag(M)^{-1} J^T. diag, NOT
        # row-sum lumping: P2 vertex rows row-sum to ~0 (singular).
        dinv = 1.0 / m_r.diagonal()
        lp = (j_r @ sp.diags(dinv) @ j_r.T).toarray()
        lp_inv = np.linalg.inv(lp)

        return SaddleMatfreeCache(
            at_pack=_pack_operator(at_r, kind, dtype, batch_hint=batch_hint),
            m_pack=_pack_operator(m_r, kind, dtype, batch_hint=batch_hint),
            j_pack=_pack_operator(j_r, kind, dtype, batch_hint=batch_hint),
            jt_pack=_pack_operator(
                j_r.T.tocsr(), kind, dtype, batch_hint=batch_hint
            ),
            bj_inv=jnp.asarray(bj, dtype),
            lp_inv=jnp.asarray(lp_inv, dtype),
            shifts=jnp.asarray(shifts_np, dtype),
            schur_coeffs=jnp.asarray(shifts_np + schur_offset, dtype),
            perm=jnp.asarray(perm.astype(np.int32)),
            iperm=jnp.asarray(iperm.astype(np.int32)),
            p_perm=jnp.asarray(p_perm.astype(np.int32)),
            p_iperm=jnp.asarray(p_iperm.astype(np.int32)),
            n=n,
            n_p=n_p,
            block=block,
            m_krylov=m_krylov,
            max_cycles=max_cycles,
            tol=tol,
        )

    def refresh_operator(self, at_sp_new, m_sp=None) -> "SaddleMatfreeCache":
        """Cheap per-macro-step value refresh (receding-horizon MPC,
        VERDICT r3 item 4): repack ONLY the system operator at_pack for
        a re-linearized at (same mesh/BC geometry; M, J, orderings and
        the pressure-Schur inverse are unchanged) and by default KEEP
        the block-Jacobi velocity preconditioner.

        Keeping the preconditioner is sound: FGMRES enforces the solve
        tolerance against the EXACT refreshed operator, so a stale
        preconditioner can only change iteration counts, never
        accuracy — and re-linearization drift across one MPC apply
        window is a small perturbation of the diagonal blocks. The
        full rebuild spent 15.5 s/macro in f64 np.linalg.inv on those
        blocks + 4.9 s stacking them (cProfile, r4); this refresh costs
        one RCM-permuted repack (~0.05 s).

        m_sp: pass the (geometry-fixed) mass matrix to ALSO re-invert
        the preconditioner blocks about the new operator, in f32
        (preconditioner quality needs no f64) — for callers that drift
        far from the build point.
        """
        import dataclasses

        import numpy as np
        import scipy.sparse as sp

        from ..ops.pallas_spmm import WindowedDense

        perm = np.asarray(self.perm)
        at_r = sp.csr_matrix(at_sp_new)[perm][:, perm].tocsr()
        dtype = self.shifts.dtype
        kind = (
            "windowed"
            if isinstance(self.at_pack, WindowedDense)
            else "ell"
        )
        new = {"at_pack": _pack_operator(at_r, kind, dtype)}
        if m_sp is not None:
            m_r = (
                sp.csr_matrix(m_sp)[perm][:, perm]
                .tocsr().astype(np.float32)
            )
            at32 = at_r.astype(np.float32)
            n_pad = int(self.bj_inv.shape[1]) * self.block
            bj = np.stack([
                _block_jacobi_inverses(at32 + s * m_r, self.block, n_pad)
                for s in np.asarray(self.shifts, np.float32)
            ])
            new["bj_inv"] = jnp.asarray(bj, dtype)
        return dataclasses.replace(self, **new)

    # ---- internals (operate in the permuted ordering) ----

    def _bj_apply(self, bj_i: jax.Array, x: jax.Array) -> jax.Array:
        """Block-diagonal solve: one batched (nb, B, B)@(nb, B, q) GEMM."""
        n, q = x.shape
        n_pad = bj_i.shape[0] * self.block
        xp = jnp.zeros((n_pad, q), x.dtype)
        xp = jax.lax.dynamic_update_slice(xp, x, (0, 0))
        xb = xp.reshape(bj_i.shape[0], self.block, q)
        yb = jnp.einsum(
            "tij,tjq->tiq", bj_i, xb,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return yb.reshape(n_pad, q)[:n]

    def _solve_perm(
        self, i: jax.Array, rv: jax.Array, rp: jax.Array,
        x0: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """FGMRES on the permuted saddle system; rv (n, q), rp (n_p, q).
        Returns (v, p, relres) in the permuted ordering."""
        s_i = self.shifts[i]
        sc_i = self.schur_coeffs[i]
        bj_i = jax.lax.dynamic_index_in_dim(self.bj_inv, i, keepdims=False)
        n = self.n

        def kop(xb):
            v, p = xb[:n], xb[n:]
            kv = (
                spmm(self.at_pack, v)
                + s_i * spmm(self.m_pack, v)
                + spmm(self.jt_pack, p)
            )
            return jnp.concatenate([kv, spmm(self.j_pack, v)], axis=0)

        def prec(xb):
            rv_, rp_ = xb[:n], xb[n:]
            # Shat = -(1/s) L_p  =>  Shat^{-1} = -s L_p^{-1} (signed!)
            p = -sc_i * (self.lp_inv @ rp_)
            v = self._bj_apply(bj_i, rv_ - spmm(self.jt_pack, p))
            return jnp.concatenate([v, p], axis=0)

        rhs = jnp.concatenate([rv, rp], axis=0)
        x, rel = fgmres(
            kop, rhs, precond=prec, m=self.m_krylov,
            tol=self.tol, max_cycles=self.max_cycles, x0=x0,
        )
        return x[:n], x[n:], rel

    # ---- public contract (original dof ordering) ----

    def solve(self, i: jax.Array, rhs: jax.Array) -> jax.Array:
        """x_v with [[A^T + s_i M, J^T],[J, 0]] [x_v; p] = [rhs; 0]."""
        squeeze = rhs.ndim == 1
        if squeeze:
            rhs = rhs[:, None]
        rv = rhs[self.perm]
        rp = jnp.zeros((self.n_p, rhs.shape[1]), rhs.dtype)
        v, _, _ = self._solve_perm(i, rv, rp)
        v = v[self.iperm]
        return v[:, 0] if squeeze else v

    def solve_relres(self, i, rhs: jax.Array) -> tuple:
        """solve() that ALSO returns the FGMRES relative residual.

        Observability hook (ADVICE r4 medium #2): fgmres returns
        silently at the cycle cap, so long-lived callers that keep a
        stale preconditioner (receding-horizon refresh path) must be
        able to SEE the achieved residual — a degraded preconditioner
        otherwise degrades accuracy with no signal.
        """
        squeeze = rhs.ndim == 1
        if squeeze:
            rhs = rhs[:, None]
        rv = rhs[self.perm]
        rp = jnp.zeros((self.n_p, rhs.shape[1]), rhs.dtype)
        v, _, rel = self._solve_perm(jnp.asarray(i, jnp.int32), rv, rp)
        v = v[self.iperm]
        return (v[:, 0] if squeeze else v), rel

    def solve_smw(
        self, i: jax.Array, u: jax.Array, v: jax.Array, rhs: jax.Array
    ) -> jax.Array:
        """(A^T + s_i M - u v^T)-saddle solve via SMW on solve()."""
        from ..ops.lowrank import smw_solve

        return smw_solve(lambda r: self.solve(i, r), u, v, rhs)

    def apply(
        self, rhs_v: jax.Array, rhs_p: jax.Array | None = None,
        i: jax.Array | int = 0, x0: tuple | None = None,
    ) -> jax.Array:
        """SaddleLU.apply parity: velocity solution for a full saddle
        rhs (nonzero pressure block allowed — BC condensation rhs)."""
        v, _p = self.apply_full(
            rhs_v,
            jnp.zeros(
                (self.n_p,) + rhs_v.shape[1:], rhs_v.dtype
            ) if rhs_p is None else rhs_p,
            i=i, x0=x0,
        )
        return v

    def apply_full(
        self, rhs_v: jax.Array, rhs_p: jax.Array,
        i: jax.Array | int = 0, x0: tuple | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """x0: optional warm start as an (v0, p0) tuple in ORIGINAL
        ordering (transient steppers carry the previous step's
        solution — cuts FGMRES cycles ~2-4x on slowly-varying rhs)."""
        squeeze = rhs_v.ndim == 1
        if squeeze:
            rhs_v = rhs_v[:, None]
            rhs_p = rhs_p[:, None]
        x0_perm = None
        if x0 is not None:
            v0, p0 = x0
            if squeeze:
                v0, p0 = v0[:, None], p0[:, None]
            x0_perm = jnp.concatenate(
                [v0[self.perm], p0[self.p_perm]], axis=0
            )
        v, p, _ = self._solve_perm(
            jnp.asarray(i, jnp.int32), rhs_v[self.perm],
            rhs_p[self.p_perm], x0=x0_perm,
        )
        v = v[self.iperm]
        p = p[self.p_iperm]
        return (v[:, 0], p[:, 0]) if squeeze else (v, p)
