"""Pallas TPU kernel for the per-bin closed-loop solve.

Solves ``A[m] y[m] = b[m]`` for every frequency bin m, with tiny static N
(FDN channel counts) and huge M (~48001 bins).  The kernel tiles the bin
axis onto the grid and performs the unrolled Gaussian elimination with
partial pivoting entirely in VMEM, with every scalar of the elimination
held as an (8, 128)-shaped vector register tile of bins.  Complex
arithmetic is explicit re/im pairs (TPU has no native complex registers).

Layout: the caller passes bin-LAST arrays — A as (N, N, M), b as (N, M) —
so each matrix entry is a contiguous lane-aligned vector of bins.

A custom VJP makes the kernel differentiable: for ``y = A^{-1} b``,
``b_bar = A^{-H} y_bar`` reuses the same kernel on the conjugate transpose
and ``A_bar = -b_bar y^H`` is a per-bin outer product (plain XLA).

Use via ``Recursion(..., solve_method='pallas')`` or
:func:`flamo_tpu.ops.solve.closed_loop_solve`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# bins per grid program; must be a multiple of (8 sublanes * 128 lanes)
TILE = 1024


def _solve_kernel(N: int, ar_ref, ai_ref, br_ref, bi_ref, yr_ref, yi_ref):
    """One bin-tile: unrolled complex GE with partial pivoting.

    refs: a* (N, N, TILE), b*/y* (N, TILE)."""
    shape = (TILE // 128, 128)

    def load(ref, *idx):
        return ref[idx].reshape(shape)

    # registers: lists of (re, im) tiles
    A = [[(load(ar_ref, i, j), load(ai_ref, i, j)) for j in range(N)]
         for i in range(N)]
    b = [(load(br_ref, i), load(bi_ref, i)) for i in range(N)]

    def cmul(x, y):
        return (x[0] * y[0] - x[1] * y[1], x[0] * y[1] + x[1] * y[0])

    def csub(x, y):
        return (x[0] - y[0], x[1] - y[1])

    def cdiv(x, y):
        den = y[0] * y[0] + y[1] * y[1]
        inv = 1.0 / den
        return ((x[0] * y[0] + x[1] * y[1]) * inv,
                (x[1] * y[0] - x[0] * y[1]) * inv)

    def cabs2(x):
        return x[0] * x[0] + x[1] * x[1]

    def csel(mask, x, y):
        return (jnp.where(mask, x[0], y[0]), jnp.where(mask, x[1], y[1]))

    for k in range(N):
        # partial pivoting over rows k..N-1 (select-based, branch-free):
        # track the running-argmax row index per bin, accumulate the pivot
        # row contents, then swap by mask.
        best = cabs2(A[k][k])
        piv_idx = jnp.full(shape, k, dtype=jnp.int32)
        pa = [A[k][j] for j in range(N)]
        pb = b[k]
        for i in range(k + 1, N):
            cand = cabs2(A[i][k])
            better = cand > best
            best = jnp.where(better, cand, best)
            piv_idx = jnp.where(better, i, piv_idx)
            pa = [csel(better, A[i][j], pa[j]) for j in range(N)]
            pb = csel(better, b[i], pb)
        # the row that supplied the pivot receives old row k
        for i in range(k + 1, N):
            m = piv_idx == i
            A[i] = [csel(m, A[k][j], A[i][j]) for j in range(N)]
            b[i] = csel(m, b[k], b[i])
        A[k] = pa
        b[k] = pb
        # eliminate below the pivot
        for i in range(k + 1, N):
            f = cdiv(A[i][k], A[k][k])
            for j in range(k + 1, N):
                A[i][j] = csub(A[i][j], cmul(f, A[k][j]))
            b[i] = csub(b[i], cmul(f, b[k]))

    # back substitution
    y = [None] * N
    for i in range(N - 1, -1, -1):
        acc = b[i]
        for j in range(i + 1, N):
            acc = csub(acc, cmul(A[i][j], y[j]))
        y[i] = cdiv(acc, A[i][i])

    for i in range(N):
        yr_ref[i] = y[i][0].reshape(-1)
        yi_ref[i] = y[i][1].reshape(-1)


def _pallas_solve_ml(ar, ai, br, bi):
    """ar/ai (N, N, Mp), br/bi (N, Mp) with Mp % TILE == 0 -> (N, Mp) x2."""
    N, _, Mp = ar.shape
    grid = (Mp // TILE,)
    mat_spec = pl.BlockSpec((N, N, TILE), lambda m: (0, 0, m),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((N, TILE), lambda m: (0, m),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((N, Mp), ar.dtype)] * 2
    yr, yi = pl.pallas_call(
        partial(_solve_kernel, N),
        grid=grid,
        in_specs=[mat_spec, mat_spec, vec_spec, vec_spec],
        out_specs=[vec_spec, vec_spec],
        out_shape=out_shape,
    )(ar, ai, br, bi)
    return yr, yi


def _solve_bins_last(A, B):
    """A (M, N, N) complex, B (M, N) complex -> y (M, N) complex, via the
    bin-last Pallas kernel with padding to a TILE multiple."""
    M, N, _ = A.shape
    Mp = ((M + TILE - 1) // TILE) * TILE
    pad = Mp - M
    # transpose to bin-last and split complex
    At = jnp.transpose(A, (1, 2, 0))
    Bt = jnp.transpose(B, (1, 0))
    if pad:
        # pad with identity systems (solution 0)
        eye = jnp.eye(N, dtype=A.dtype)[:, :, None]
        At = jnp.concatenate(
            [At, jnp.broadcast_to(eye, (N, N, pad))], axis=2)
        Bt = jnp.concatenate([Bt, jnp.zeros((N, pad), dtype=B.dtype)],
                             axis=2 - 1)
    yr, yi = _pallas_solve_ml(jnp.real(At), jnp.imag(At),
                              jnp.real(Bt), jnp.imag(Bt))
    y = (yr + 1j * yi)[:, :M]
    return jnp.transpose(y, (1, 0))


@jax.custom_vjp
def pallas_gauss_solve(A, B):
    """Solve A y = B per bin with the Pallas TPU kernel.

    A: (..., M, N, N) complex; B: (..., M, N) complex (vector rhs).
    Leading batch dims are folded into M."""
    return _solve_impl(A, B)


def _solve_impl(A, B):
    batch_shape = B.shape[:-1]
    N = A.shape[-1]
    A2 = jnp.broadcast_to(A, batch_shape + (N, N)).reshape(-1, N, N)
    B2 = B.reshape(-1, N)
    y = _solve_bins_last(A2, B2)
    return y.reshape(B.shape)


def _solve_fwd(A, B):
    y = _solve_impl(A, B)
    return y, (A, y)


def _solve_bwd(res, y_bar):
    A, y = res
    # JAX cotangents transform by the UNconjugated transpose: for
    # y = A^{-1} b,  b_bar = A^{-T} y_bar  and  A_bar = -b_bar y^T.
    AT = jnp.swapaxes(A, -1, -2)
    b_bar = _solve_impl(AT, y_bar)
    A_bar = -jnp.einsum("...i,...j->...ij", b_bar, y)
    # reduce over broadcasted batch dims of A
    extra = b_bar.ndim - (A.ndim - 1)
    if extra > 0:
        A_bar = jnp.sum(A_bar, axis=tuple(range(extra)))
    return A_bar, b_bar


pallas_gauss_solve.defvjp(_solve_fwd, _solve_bwd)
