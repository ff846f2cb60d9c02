"""Per-bin closed-loop solve kernels.

The hottest op in the framework (SURVEY.md §3.3): for every frequency bin m
solve ``(I - F(m) B(m)) y = rhs(m)`` with tiny N (FDN channel counts, N<=32)
and huge bin batch (M = nfft//2+1 ~ 48001).

``jnp.linalg.solve`` lowers to batched LU on TPU, which is correct but pays
LAPACK-shaped overhead per tiny matrix.  :func:`gauss_solve` instead unrolls
Gaussian elimination with partial pivoting over the *static* dimension N and
vectorizes every scalar operation over the bin axis — XLA fuses the whole
elimination into a handful of VPU kernels.  Complex arithmetic stays native
(complex64).

Reference semantics: torch.linalg.solve at flamo/processor/system.py:425.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gauss_solve_raw(A: jax.Array, B: jax.Array, pivot: bool = True) -> jax.Array:
    """Solve ``A x = B`` for small trailing dims, batched over leading dims.

    A: (..., N, N); B: (..., N) or (..., N, K).  Unrolled Gaussian
    elimination with partial pivoting; all per-bin scalars are vectors over
    the batch, so the unrolled program is pure elementwise math that XLA
    fuses.  Matches ``jnp.linalg.solve`` to ~1e-6 for well-conditioned
    closed-loop matrices.

    ``pivot=False`` skips the pivot search/swap (~40% of the vector ops) —
    only safe when every diagonal stays well away from zero throughout
    elimination (e.g. diagonally-dominant-ish closed loops); exposed as
    ``closed_loop_solve(method='ge_nopivot')``.
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    N = A.shape[-1]
    vector_rhs = B.ndim == A.ndim - 1
    if vector_rhs:
        B = B[..., None]
    if N == 1:
        x = B / A[..., 0:1, :]
        return x[..., 0] if vector_rhs else x

    # augmented system columns: work on lists of (..., K) row slices
    # rows[i] has shape (..., N) for A part and (..., K) for B part
    arows = [A[..., i, :] for i in range(N)]
    brows = [B[..., i, :] for i in range(N)]

    for k in range(N):
        if pivot:
            # partial pivoting: pick the row (k..N-1) with max |A[i, k]|.
            # Selection is done with pure jnp.where chains — no gathers —
            # so both forward AND backward lower to fused VPU selects (a
            # take_along_axis here would make the VJP a per-bin scatter,
            # which serializes on TPU).
            mags = jnp.stack([jnp.abs(arows[i][..., k])
                              for i in range(k, N)], axis=-1)
            piv = jnp.argmax(mags, axis=-1)  # (...) int in [0, N-k)
            pa = arows[k]
            pb = brows[k]
            for i in range(k + 1, N):
                sel = (piv == (i - k))[..., None]
                pa = jnp.where(sel, arows[i], pa)
                pb = jnp.where(sel, brows[i], pb)
            # swap: the row that provided the pivot receives old row k
            for i in range(k + 1, N):
                is_piv = (piv == (i - k))[..., None]
                arows[i] = jnp.where(is_piv, arows[k], arows[i])
                brows[i] = jnp.where(is_piv, brows[k], brows[i])
            arows[k], brows[k] = pa, pb

        inv_pivot = 1.0 / arows[k][..., k]
        for i in range(k + 1, N):
            factor = (arows[i][..., k] * inv_pivot)[..., None]
            arows[i] = arows[i] - factor * arows[k]
            brows[i] = brows[i] - factor * brows[k]

    # back substitution
    xrows: list = [None] * N
    for i in range(N - 1, -1, -1):
        acc = brows[i]
        for j in range(i + 1, N):
            acc = acc - arows[i][..., j][..., None] * xrows[j]
        xrows[i] = acc / arows[i][..., i][..., None]

    x = jnp.stack(xrows, axis=-2)  # (..., N, K)
    return x[..., 0] if vector_rhs else x


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def gauss_solve(A: jax.Array, B: jax.Array, pivot: bool = True) -> jax.Array:
    """:func:`_gauss_solve_raw` with the classical solve VJP.

    Differentiating THROUGH the unrolled elimination stores every row
    intermediate (HBM traffic dominates this solver); the closed form
    needs only one transpose-solve: ``B_bar = A^{-T} Y_bar`` and
    ``A_bar = -B_bar Y^T`` (JAX's unconjugated-transpose cotangent
    convention, same derivation as ops/pallas_solve.py)."""
    return _gauss_solve_raw(A, B, pivot)


def _gauss_solve_fwd(A, B, pivot):
    Y = _gauss_solve_raw(A, B, pivot)
    return Y, (A, Y)


def _gauss_solve_bwd(pivot, res, Y_bar):
    A, Y = res
    AT = jnp.swapaxes(A, -1, -2)  # unconjugated transpose
    B_bar = _gauss_solve_raw(AT, Y_bar, pivot)
    if Y.ndim == A.ndim - 1:  # vector rhs
        A_bar = -B_bar[..., :, None] * Y[..., None, :]
    else:
        A_bar = -jnp.einsum("...ik,...jk->...ij", B_bar, Y)
    return A_bar, B_bar


gauss_solve.defvjp(_gauss_solve_fwd, _gauss_solve_bwd)


def _ge_nopivot_factor(A, B):
    """No-pivot elimination that also returns the LU factors: U as its row
    list and the L multipliers, both kept as (...,)-vector pytree leaves so
    no stacking kernels are emitted for the residuals."""
    N = A.shape[-1]
    arows = [A[..., i, :] for i in range(N)]
    brows = [B[..., i, :] for i in range(N)]
    factors = []
    for k in range(N):
        inv = 1.0 / arows[k][..., k]
        for i in range(k + 1, N):
            f = arows[i][..., k] * inv
            factors.append(f)
            arows[i] = arows[i] - f[..., None] * arows[k]
            brows[i] = brows[i] - f[..., None] * brows[k]
    xrows = [None] * N
    for i in range(N - 1, -1, -1):
        acc = brows[i]
        for j in range(i + 1, N):
            acc = acc - arows[i][..., j][..., None] * xrows[j]
        xrows[i] = acc / arows[i][..., i][..., None]
    return jnp.stack(xrows, axis=-2), tuple(arows), tuple(factors)


@jax.custom_vjp
def gauss_solve_cached(A: jax.Array, B: jax.Array) -> jax.Array:
    """No-pivot solve whose VJP reuses the forward LU factors.

    The closed-form cotangent needs ``A^{-T} Y_bar``; instead of a second
    elimination this back-solves through the saved factors
    (``U^T w = Y_bar`` then ``L^T B_bar = w``) — two triangular passes on
    (...,)-width vectors, ~half the backward traffic of re-eliminating.
    Same nonvanishing-pivot requirement as ``gauss_solve(pivot=False)``;
    exposed as ``closed_loop_solve(method='ge_cached')``."""
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    vec = B.ndim == A.ndim - 1
    Y, _, _ = _ge_nopivot_factor(A, B[..., None] if vec else B)
    return Y[..., 0] if vec else Y


def _gauss_solve_cached_fwd(A, B):
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    vec = B.ndim == A.ndim - 1
    Y, arows, factors = _ge_nopivot_factor(A, B[..., None] if vec else B)
    return (Y[..., 0] if vec else Y), (arows, factors, Y, vec)


def _gauss_solve_cached_bwd(res, Y_bar):
    arows, flat_f, Y, vec = res
    N = len(arows)
    if vec:
        Y_bar = Y_bar[..., None]
    # rebuild factors[i][k] (i > k), stored column-major by k
    factors = [[None] * N for _ in range(N)]
    it = iter(flat_f)
    for k in range(N):
        for i in range(k + 1, N):
            factors[i][k] = next(it)
    # A^T B_bar = Y_bar with A = L U (unconjugated transposes):
    # U^T w = Y_bar — forward substitution (U^T lower, diag U_ii)
    ybr = [Y_bar[..., i, :] for i in range(N)]
    w = [None] * N
    for i in range(N):
        acc = ybr[i]
        for j in range(i):
            acc = acc - arows[j][..., i][..., None] * w[j]
        w[i] = acc / arows[i][..., i][..., None]
    # L^T B_bar = w — back substitution (unit diag; L^T[i,j] = L[j,i])
    bbar = [None] * N
    for i in range(N - 1, -1, -1):
        acc = w[i]
        for j in range(i + 1, N):
            acc = acc - factors[j][i][..., None] * bbar[j]
        bbar[i] = acc
    B_bar = jnp.stack(bbar, axis=-2)
    A_bar = -jnp.einsum("...ik,...jk->...ij", B_bar, Y)
    return A_bar, (B_bar[..., 0] if vec else B_bar)


gauss_solve_cached.defvjp(_gauss_solve_cached_fwd, _gauss_solve_cached_bwd)


def gauss_solve_mat(A: jax.Array, B: jax.Array) -> jax.Array:
    """No-pivot elimination in matrix form: one rank-1 update per column
    instead of per-row ops — ~2.5x fewer but LARGER kernels.  Measured on
    the flagship workload this LOSES to the row form 4x (417 vs 1636
    steps/s): each rank-1 update touches the full (M, N, N) panel, so HBM
    traffic grows ~N/2-fold and the solve is bandwidth-bound, not
    launch-overhead-bound.  Kept as a pinned-correct reference point;
    prefer ``gauss_solve(pivot=False)``.  Exposed as
    ``closed_loop_solve(method='ge_mat')``."""
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    N = A.shape[-1]
    vec = B.ndim == A.ndim - 1
    if vec:
        B = B[..., None]
    rows = jnp.arange(N)
    for k in range(N):
        col = A[..., :, k]
        pivot = col[..., k:k + 1]
        factor = jnp.where(rows > k, col / pivot, 0)[..., None]
        A = A - factor * A[..., k:k + 1, :]
        B = B - factor * B[..., k:k + 1, :]
    X = jnp.zeros_like(B)
    for i in range(N - 1, -1, -1):
        dot = jnp.einsum("...j,...jk->...k", A[..., i, :], X)
        X = X.at[..., i, :].set((B[..., i, :] - dot) / A[..., i, i:i + 1])
    return X[..., 0] if vec else X


@jax.custom_vjp
def gauss_solve_loop(A: jax.Array, B: jax.Array) -> jax.Array:
    """:func:`gauss_solve` semantics for medium/large N via ``fori_loop``.

    The unrolled variant emits O(N^2) HLO statements — fine for FDN-sized
    N<=32, compile-hostile beyond.  This version keeps the same gather-free
    design (pivot selection and row swaps are one-hot mask reductions, so
    the VJP is selects + matvecs, never per-bin scatters) but rolls the
    elimination into two ``lax.fori_loop``s: O(1) compiled statements for
    any N.
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    N = A.shape[-1]
    vector_rhs = B.ndim == A.ndim - 1
    if vector_rhs:
        B = B[..., None]
    rows = jnp.arange(N)

    def fwd_body(k, state):
        A, B = state
        ek = rows == k                                   # (N,) one-hot row k
        colk = jnp.sum(jnp.where(ek, A, 0), axis=-1)     # A[..., :, k]
        # pivot row among i >= k: one-hot via masked argmax (no gathers)
        mags = jnp.where(rows >= k, jnp.abs(colk), -1.0)
        piv = jnp.argmax(mags, axis=-1)                  # (...)
        epiv = rows == piv[..., None]                    # (..., N) one-hot
        # swap rows k <-> piv by mask-reduction row extraction; the two
        # corrections cancel elementwise when piv == k
        rowk_A = jnp.sum(jnp.where(ek[..., None], A, 0), axis=-2)
        rowp_A = jnp.sum(jnp.where(epiv[..., None], A, 0), axis=-2)
        rowk_B = jnp.sum(jnp.where(ek[..., None], B, 0), axis=-2)
        rowp_B = jnp.sum(jnp.where(epiv[..., None], B, 0), axis=-2)
        # pure selects (bool*complex converts are unimplemented on some TPU
        # backends); epiv & ~ek makes piv == k a no-op
        not_k = epiv & ~ek
        A = jnp.where(ek[..., None], rowp_A[..., None, :], A)
        A = jnp.where(not_k[..., None], rowk_A[..., None, :], A)
        B = jnp.where(ek[..., None], rowp_B[..., None, :], B)
        B = jnp.where(not_k[..., None], rowk_B[..., None, :], B)
        # eliminate below the pivot
        pivval = jnp.sum(jnp.where(ek, rowp_A, 0), axis=-1)  # A[..., k, k]
        colk = jnp.sum(jnp.where(ek, A, 0), axis=-1)
        factor = jnp.where(rows > k, colk / pivval[..., None], 0)
        A = A - factor[..., None] * rowp_A[..., None, :]
        B = B - factor[..., None] * rowp_B[..., None, :]
        return A, B

    A, B = jax.lax.fori_loop(0, N, fwd_body, (A, B))

    def back_body(j, x):
        i = N - 1 - j
        ei = rows == i
        rowi_A = jnp.sum(jnp.where(ei[..., None], A, 0), axis=-2)  # (..., N)
        rowi_B = jnp.sum(jnp.where(ei[..., None], B, 0), axis=-2)  # (..., K)
        dot = jnp.sum(rowi_A[..., None] * x, axis=-2)              # (..., K)
        diag = jnp.sum(jnp.where(ei, rowi_A, 0), axis=-1)
        xi = (rowi_B - dot) / diag[..., None]
        return jnp.where(ei[..., None], xi[..., None, :], x)

    x = jax.lax.fori_loop(0, N, back_body, jnp.zeros_like(B))
    return x[..., 0] if vector_rhs else x


def _gauss_solve_loop_fwd(A, B):
    Y = gauss_solve_loop(A, B)
    return Y, (A, Y)


def _gauss_solve_loop_bwd(res, Y_bar):
    # closed-form solve cotangent — differentiating through two fori_loops
    # would otherwise store every iteration's carries
    A, Y = res
    B_bar = gauss_solve_loop(jnp.swapaxes(A, -1, -2), Y_bar)
    if Y.ndim == A.ndim - 1:
        A_bar = -B_bar[..., :, None] * Y[..., None, :]
    else:
        A_bar = -jnp.einsum("...ik,...jk->...ij", B_bar, Y)
    return A_bar, B_bar


gauss_solve_loop.defvjp(_gauss_solve_loop_fwd, _gauss_solve_loop_bwd)


def closed_loop_solve(A: jax.Array, B: jax.Array, method: str = "ge") -> jax.Array:
    """Dispatch for the Recursion solve.

    method: 'ge' (gather-free elimination, default — unrolled for N<=32,
    fori_loop for larger N), 'ge_nopivot' (unrolled, no pivot search —
    faster, caller guarantees nonvanishing pivots), 'pallas' (fused Pallas
    TPU kernel, vector rhs only), or 'lu' (``jnp.linalg.solve``).
    """
    if method == "pallas" and B.ndim == A.ndim - 1:
        from flamo_tpu.ops.pallas_solve import pallas_gauss_solve

        return pallas_gauss_solve(A, B)
    if method == "ge_nopivot":
        return gauss_solve(A, B, pivot=False)
    if method == "ge_cached":
        return gauss_solve_cached(A, B)
    if method == "ge_mat":
        return gauss_solve_mat(A, B)
    if method == "lu":
        if B.ndim == A.ndim - 1:
            return jnp.linalg.solve(A, B[..., None])[..., 0]
        return jnp.linalg.solve(A, B)
    if A.shape[-1] > 32:
        # The experimental 'axon' tunnel backend historically raised
        # UNIMPLEMENTED on (even trivial) fori_loop programs like
        # gauss_solve_loop; re-tested 2026-08-17 it RUNS and beats
        # batched LU 1.4x fwd+bwd (bench n64_ge_loop_ms 0.039 vs
        # n64_lu_ms 0.054).  bench emits that record every run; if the
        # tunnel regresses, set FLAMO_TPU_N64_LU=1 to reroute to LU
        # (trace-time static check).
        import os

        if os.environ.get("FLAMO_TPU_N64_LU"):
            if B.ndim == A.ndim - 1:
                return jnp.linalg.solve(A, B[..., None])[..., 0]
            return jnp.linalg.solve(A, B)
        return gauss_solve_loop(A, B)
    return gauss_solve(A, B)
