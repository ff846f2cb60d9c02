"""Pallas TPU kernels for the per-bin closed-loop solve.

Two kernels share one in-register Gaussian-elimination core:

* :func:`pallas_gauss_solve` — generic ``A[m] y[m] = b[m]`` for dense
  per-bin matrices,
* :func:`pallas_fdn_solve` — the FDN fast path ``(I - diag(D[m]) U) y[m]
  = b[m]``: the loop matrix is ASSEMBLED IN REGISTERS from the delay-line
  response D (M, N) and the frequency-flat mixing matrix U (N, N), so the
  (M, N, N) matrix never touches HBM.

Tiny static N (FDN channel counts), huge M (~48001 bins).  The bin axis is
tiled onto the grid; every scalar of the elimination is an (8, 128) vector
register tile of bins.  Complex arithmetic is explicit re/im pairs (TPU
has no native complex registers).  Pivoting is select-based (branch-free,
scatter-free VJPs).

Custom VJPs (JAX cotangents transform by the UNconjugated transpose):
  y = A^{-1} b:   b_bar = A^{-T} y_bar,  A_bar = -b_bar y^T
  FDN:            D_bar[m,i] = b_bar[m,i] (U y[m])[i]
                  U_bar[i,j] = sum_m b_bar[m,i] D[m,i] y[m,j]

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

# bins per grid program.  1024 = exactly ONE native f32 (8, 128) vector
# register per elimination scalar — do not change it: TILE=512 (half-reg
# tiles) and TILE=2048 (double-reg) both measured 20-40x SLOWER on chip
# (279 / 473 vs 10770 steps/s end to end, 2026-08-17 sweep).
TILE = 1024


def _interpret() -> bool:
    """Run the kernels through the Pallas interpreter on the CPU backend
    (CI, `--device cpu` examples); Mosaic-compile on TPU backends (incl.
    the tunneled 'axon' platform, where Mosaic kernels run as of
    2026-08-16).  Eager calls under ``utils.host_eager()`` (default
    DEVICE pinned to cpu while the default backend stays 'tpu') must
    interpret too — Mosaic lowering on the CPU platform is an error."""
    if jax.default_backend() == "cpu":
        return True
    dd = jax.config.jax_default_device
    if dd is None:
        return False
    # jax_default_device accepts a Device object OR a platform string
    # (jax.config.update('jax_default_device', 'cpu'))
    platform = dd if isinstance(dd, str) else dd.platform
    return platform == "cpu"


# ---------------------------------------------------------------------------
# in-register complex arithmetic + GE core (shared by both kernels)
# ---------------------------------------------------------------------------
def _cmul(x, y):
    return (x[0] * y[0] - x[1] * y[1], x[0] * y[1] + x[1] * y[0])


def _csub(x, y):
    return (x[0] - y[0], x[1] - y[1])


def _cdiv(x, y):
    den = y[0] * y[0] + y[1] * y[1]
    inv = 1.0 / den
    return ((x[0] * y[0] + x[1] * y[1]) * inv,
            (x[1] * y[0] - x[0] * y[1]) * inv)


def _cabs2(x):
    return x[0] * x[0] + x[1] * x[1]


def _crecip(y):
    """conj(y) / |y|^2 — hoists a pivot's reciprocal so the per-row
    multiplier becomes one complex MULTIPLY (4 mul + 2 add) instead of a
    full complex division (6 mul + 3 add after the compiler CSEs the
    shared denominator): the elimination's (N-1-k) rows per pivot share
    one reciprocal."""
    inv = 1.0 / (y[0] * y[0] + y[1] * y[1])
    return (y[0] * inv, -y[1] * inv)


def _csel(mask, x, y):
    return (jnp.where(mask, x[0], y[0]), jnp.where(mask, x[1], y[1]))


def _ge_core(A, b, N, shape):
    """Unrolled complex Gaussian elimination with select-based partial
    pivoting.  A: NxN list-of-lists of (re, im) tiles; b: N list."""
    for k in range(N):
        best = _cabs2(A[k][k])
        piv_idx = jnp.full(shape, k, dtype=jnp.int32)
        pa = [A[k][j] for j in range(N)]
        pb = b[k]
        for i in range(k + 1, N):
            cand = _cabs2(A[i][k])
            better = cand > best
            best = jnp.where(better, cand, best)
            piv_idx = jnp.where(better, i, piv_idx)
            pa = [_csel(better, A[i][j], pa[j]) for j in range(N)]
            pb = _csel(better, b[i], pb)
        for i in range(k + 1, N):
            m = piv_idx == i
            A[i] = [_csel(m, A[k][j], A[i][j]) for j in range(N)]
            b[i] = _csel(m, b[k], b[i])
        A[k] = pa
        b[k] = pb
        pinv = _crecip(A[k][k])  # one reciprocal per pivot
        for i in range(k + 1, N):
            f = _cmul(A[i][k], pinv)
            for j in range(k + 1, N):
                A[i][j] = _csub(A[i][j], _cmul(f, A[k][j]))
            b[i] = _csub(b[i], _cmul(f, b[k]))

    y = [None] * N
    for i in range(N - 1, -1, -1):
        acc = b[i]
        for j in range(i + 1, N):
            acc = _csub(acc, _cmul(A[i][j], y[j]))
        y[i] = _cdiv(acc, A[i][i])
    return y


# ---------------------------------------------------------------------------
# generic dense solve kernel
# ---------------------------------------------------------------------------
def _solve_kernel(N: int, ar_ref, ai_ref, br_ref, bi_ref, yr_ref, yi_ref):
    """One bin-tile.  refs: a* (N, N, TILE), b*/y* (N, TILE)."""
    shape = (TILE // 128, 128)

    A = [[(ar_ref[i, j].reshape(shape), ai_ref[i, j].reshape(shape))
          for j in range(N)] for i in range(N)]
    b = [(br_ref[i].reshape(shape), bi_ref[i].reshape(shape))
         for i in range(N)]
    y = _ge_core(A, b, N, shape)
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
        interpret=_interpret(),
    )(ar, ai, br, bi)
    return yr, yi


def _solve_bins_last(A, B):
    """A (M, N, N) complex, B (M, N) complex -> y (M, N) complex."""
    M, N, _ = A.shape
    Mp = ((M + TILE - 1) // TILE) * TILE
    pad = Mp - M
    At = jnp.transpose(A, (1, 2, 0))
    Bt = jnp.transpose(B, (1, 0))
    if pad:
        eye = jnp.eye(N, dtype=A.dtype)[:, :, None]
        At = jnp.concatenate(
            [At, jnp.broadcast_to(eye, (N, N, pad))], axis=2)
        Bt = jnp.concatenate([Bt, jnp.zeros((N, pad), dtype=B.dtype)],
                             axis=1)
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
    AT = jnp.swapaxes(A, -1, -2)
    b_bar = _solve_impl(AT, y_bar)
    A_bar = -jnp.einsum("...i,...j->...ij", b_bar, y)
    extra = b_bar.ndim - (A.ndim - 1)
    if extra > 0:
        A_bar = jnp.sum(A_bar, axis=tuple(range(extra)))
    return A_bar, b_bar


pallas_gauss_solve.defvjp(_solve_fwd, _solve_bwd)


# ---------------------------------------------------------------------------
# fused FDN-loop kernel: assemble I - diag(D) U in registers + solve
# ---------------------------------------------------------------------------
def _fdn_kernel(N: int, transpose: bool, dr_ref, di_ref, u_ref,
                br_ref, bi_ref, yr_ref, yi_ref):
    """One bin-tile of the fused FDN solve.

    refs: d*/b*/y* (N, TILE); u (N, N) frequency-flat real mixing matrix.
    transpose=False: A = I - diag(D) U (rows of U scaled by D[i]).
    transpose=True:  A = (I - diag(D) U)^T = I - U^T diag(D)
                     (A[i][j] = delta_ij - U[j, i] D[j])."""
    shape = (TILE // 128, 128)

    D = [(dr_ref[i].reshape(shape), di_ref[i].reshape(shape))
         for i in range(N)]
    b = [(br_ref[i].reshape(shape), bi_ref[i].reshape(shape))
         for i in range(N)]

    A = []
    for i in range(N):
        row = []
        for j in range(N):
            if transpose:
                u = u_ref[j, i]
                d = D[j]
            else:
                u = u_ref[i, j]
                d = D[i]
            re = -d[0] * u
            im = -d[1] * u
            if i == j:
                re = re + 1.0
            row.append((re, im))
        A.append(row)

    y = _ge_core(A, b, N, shape)
    for i in range(N):
        yr_ref[i] = y[i][0].reshape(-1)
        yi_ref[i] = y[i][1].reshape(-1)


def _pallas_fdn_ml(dr, di, u, br, bi, transpose: bool):
    N, Mp = dr.shape
    grid = (Mp // TILE,)
    vec_spec = pl.BlockSpec((N, TILE), lambda m: (0, m),
                            memory_space=pltpu.VMEM)
    u_spec = pl.BlockSpec((N, N), lambda m: (0, 0),
                          memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((N, Mp), dr.dtype)] * 2
    yr, yi = pl.pallas_call(
        partial(_fdn_kernel, N, transpose),
        grid=grid,
        in_specs=[vec_spec, vec_spec, u_spec, vec_spec, vec_spec],
        out_specs=[vec_spec, vec_spec],
        out_shape=out_shape,
        interpret=_interpret(),
    )(dr, di, u, br, bi)
    return yr, yi


def _fdn_impl(D, U, B, transpose=False):
    """D (M, N) complex, U (N, N) real, B (M, N) complex -> y (M, N)."""
    M, N = D.shape
    Mp = ((M + TILE - 1) // TILE) * TILE
    pad = Mp - M
    Dt = jnp.transpose(D, (1, 0))
    Bt = jnp.transpose(B, (1, 0))
    if pad:
        # pad with D=0 -> A=I -> y=0 for the padded bins
        Dt = jnp.concatenate([Dt, jnp.zeros((N, pad), Dt.dtype)], axis=1)
        Bt = jnp.concatenate([Bt, jnp.zeros((N, pad), Bt.dtype)], axis=1)
    yr, yi = _pallas_fdn_ml(jnp.real(Dt), jnp.imag(Dt),
                            U.astype(jnp.real(Dt).dtype),
                            jnp.real(Bt), jnp.imag(Bt), transpose)
    y = (yr + 1j * yi)[:, :M]
    return jnp.transpose(y, (1, 0))


@jax.custom_vjp
def pallas_fdn_solve(D, U, B):
    """Fused FDN closed-loop solve: ``(I - diag(D[m]) U) y[m] = B[m]``.

    D: (M, N) complex delay-line responses; U: (N, N) real mixing matrix;
    B: (M, N) complex rhs.  The per-bin loop matrix lives only in vector
    registers — zero HBM traffic for the (M, N, N) assembly."""
    return _fdn_impl(D, U, B)


def _fdn_fwd(D, U, B):
    y = _fdn_impl(D, U, B)
    return y, (D, U, y)


def _fdn_bwd(res, y_bar):
    D, U, y = res
    b_bar = _fdn_impl(D, U, y_bar, transpose=True)
    Uy = jnp.einsum("ij,mj->mi", U.astype(y.dtype), y)
    D_bar = b_bar * Uy
    U_bar = jnp.real(jnp.einsum("mi,mi,mj->ij", b_bar, D, y))
    return D_bar, U_bar, b_bar


pallas_fdn_solve.defvjp(_fdn_fwd, _fdn_bwd)


# ---------------------------------------------------------------------------
# fused FDN transfer-function kernel: tf(z) = c^T (I - diag(D) U)^{-1} b
# ---------------------------------------------------------------------------
def _assemble_fdn(N, dr_ref, di_ref, u_ref, shape, transpose=False):
    """I - diag(D) U as an NxN list-of-lists of (re, im) register tiles."""
    D = [(dr_ref[i].reshape(shape), di_ref[i].reshape(shape))
         for i in range(N)]
    A = []
    for i in range(N):
        row = []
        for j in range(N):
            if transpose:
                u = u_ref[j, i]
                d = D[j]
            else:
                u = u_ref[i, j]
                d = D[i]
            re = -d[0] * u
            im = -d[1] * u
            if i == j:
                re = re + 1.0
            row.append((re, im))
        A.append(row)
    return A, D


def _fdn_tf_kernel(N: int, dr_ref, di_ref, u_ref, b_ref, c_ref,
                   tr_ref, ti_ref, yr_ref, yi_ref):
    """out_m = sum_i c_i y_mi with (I - diag(D_m) U) y_m = D_m * b
    (the canonical FDN transfer function: delays feed both the loop
    matrix and the input injection).

    The input projection b (N,) and output projection c (N,) live in the
    kernel: the (M, N) rhs never touches HBM.  y is written out for the
    backward (the kernel is issue-bound, so storing beats recomputing —
    measured 9.3k vs 11k+ steps/s end to end).  refs: d*/y* (N, TILE),
    u (N, N), b/c (N, 1) real, t* (1, TILE)."""
    shape = (TILE // 128, 128)
    A, D = _assemble_fdn(N, dr_ref, di_ref, u_ref, shape)
    rhs = [(D[i][0] * b_ref[i, 0], D[i][1] * b_ref[i, 0])
           for i in range(N)]
    y = _ge_core(A, rhs, N, shape)
    acc_r = jnp.zeros(shape, dr_ref.dtype)
    acc_i = jnp.zeros(shape, dr_ref.dtype)
    for i in range(N):
        acc_r = acc_r + c_ref[i, 0] * y[i][0]
        acc_i = acc_i + c_ref[i, 0] * y[i][1]
        yr_ref[i] = y[i][0].reshape(-1)
        yi_ref[i] = y[i][1].reshape(-1)
    tr_ref[0] = acc_r.reshape(-1)
    ti_ref[0] = acc_i.reshape(-1)


def _fdn_tf_bwd_kernel(N: int, dr_ref, di_ref, u_ref, b_ref, c_ref,
                       yr_ref, yi_ref, tbr_ref, tbi_ref,
                       dbr_ref, dbi_ref, ub_ref, bb_ref, cb_ref):
    """Backward tile: ONE elimination (w = A^{-T} c); y comes from the
    forward.  Then

        D_bar_mi = (tf_bar_m w_mi) ((U y_m)_i + b_i)
        U_bar_ij = Re sum_m tf_bar_m w_mi D_mi y_mj   (per-tile partial)
        b_bar_i  = Re sum_m tf_bar_m w_mi D_mi        (per-tile partial)
        c_bar_i  = Re sum_m tf_bar_m y_mi             (per-tile partial)

    Partials are written per grid program and summed by the caller."""
    shape = (TILE // 128, 128)
    zeros = jnp.zeros(shape, dr_ref.dtype)
    At, D = _assemble_fdn(N, dr_ref, di_ref, u_ref, shape, transpose=True)
    rhs_c = [(c_ref[i, 0] + zeros, zeros) for i in range(N)]
    w = _ge_core(At, rhs_c, N, shape)
    y = [(yr_ref[i].reshape(shape), yi_ref[i].reshape(shape))
         for i in range(N)]
    tb = (tbr_ref[0].reshape(shape), tbi_ref[0].reshape(shape))

    # U y per channel (complex, real U)
    Uy = []
    for i in range(N):
        ur = jnp.zeros(shape, dr_ref.dtype)
        ui = jnp.zeros(shape, dr_ref.dtype)
        for j in range(N):
            ur = ur + u_ref[i, j] * y[j][0]
            ui = ui + u_ref[i, j] * y[j][1]
        Uy.append((ur, ui))

    bbar_rows = []
    cbar_rows = []
    ubar_rows = []
    for i in range(N):
        bb = _cmul(tb, w[i])          # per-bin rhs cotangent
        # D appears in the matrix (-diag(D) U) AND the rhs (diag(D) b)
        db = _cmul(bb, (Uy[i][0] + b_ref[i, 0], Uy[i][1]))
        dbr_ref[i] = db[0].reshape(-1)
        dbi_ref[i] = db[1].reshape(-1)
        bbar_rows.append(jnp.sum(_cmul(bb, D[i])[0]))
        cbar_rows.append(jnp.sum(_cmul(tb, y[i])[0]))
        bbD = _cmul(bb, D[i])
        row = []
        for j in range(N):
            row.append(jnp.sum(_cmul(bbD, y[j])[0]))
        ubar_rows.append(jnp.stack(row))
    ub_ref[0] = jnp.stack(ubar_rows)
    bb_ref[0] = jnp.stack(bbar_rows).reshape(N, 1)
    cb_ref[0] = jnp.stack(cbar_rows).reshape(N, 1)


def _fdn_tf_ml(dr, di, u, b, c):
    N, Mp = dr.shape
    grid = (Mp // TILE,)
    vec_spec = pl.BlockSpec((N, TILE), lambda m: (0, m),
                            memory_space=pltpu.VMEM)
    u_spec = pl.BlockSpec((N, N), lambda m: (0, 0),
                          memory_space=pltpu.VMEM)
    nv_spec = pl.BlockSpec((N, 1), lambda m: (0, 0),
                           memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((1, TILE), lambda m: (0, m),
                          memory_space=pltpu.VMEM)
    out_shape = ([jax.ShapeDtypeStruct((1, Mp), dr.dtype)] * 2
                 + [jax.ShapeDtypeStruct((N, Mp), dr.dtype)] * 2)
    tr, ti, yr, yi = pl.pallas_call(
        partial(_fdn_tf_kernel, N),
        grid=grid,
        in_specs=[vec_spec, vec_spec, u_spec, nv_spec, nv_spec],
        out_specs=[t_spec, t_spec, vec_spec, vec_spec],
        out_shape=out_shape,
        interpret=_interpret(),
    )(dr, di, u, b, c)
    return tr, ti, yr, yi


def _fdn_tf_bwd_ml(dr, di, u, b, c, yr, yi, tbr, tbi):
    N, Mp = dr.shape
    n_tiles = Mp // TILE
    grid = (n_tiles,)
    vec_spec = pl.BlockSpec((N, TILE), lambda m: (0, m),
                            memory_space=pltpu.VMEM)
    u_spec = pl.BlockSpec((N, N), lambda m: (0, 0),
                          memory_space=pltpu.VMEM)
    nv_spec = pl.BlockSpec((N, 1), lambda m: (0, 0),
                           memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((1, TILE), lambda m: (0, m),
                          memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        partial(_fdn_tf_bwd_kernel, N),
        grid=grid,
        in_specs=[vec_spec, vec_spec, u_spec, nv_spec, nv_spec,
                  vec_spec, vec_spec, t_spec, t_spec],
        out_specs=[vec_spec, vec_spec,
                   pl.BlockSpec((1, N, N), lambda m: (m, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, N, 1), lambda m: (m, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, N, 1), lambda m: (m, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((N, Mp), dr.dtype)] * 2
        + [jax.ShapeDtypeStruct((n_tiles, N, N), dr.dtype),
           jax.ShapeDtypeStruct((n_tiles, N, 1), dr.dtype),
           jax.ShapeDtypeStruct((n_tiles, N, 1), dr.dtype)],
        interpret=_interpret(),
    )(dr, di, u, b, c, yr, yi, tbr, tbi)
    return outs


def _fdn_tf_prep(D, U, b, c):
    M, N = D.shape
    Mp = ((M + TILE - 1) // TILE) * TILE
    pad = Mp - M
    Dt = jnp.transpose(D, (1, 0))
    if pad:
        Dt = jnp.concatenate([Dt, jnp.zeros((N, pad), Dt.dtype)], axis=1)
    rdtype = jnp.real(D).dtype
    return (jnp.real(Dt), jnp.imag(Dt), U.astype(rdtype),
            b.astype(rdtype)[:, None], c.astype(rdtype)[:, None], M, Mp)


@jax.custom_vjp
def pallas_fdn_tf(D, U, b, c):
    """Fused FDN SISO transfer function on the rfft grid:

        tf_m = c^T (I - diag(D_m) U)^{-1} diag(D_m) b

    D (M, N) complex delay-line responses; U (N, N) real mixing matrix;
    b/c (N,) real input/output gains.  Assembly, solve, and both
    projections happen in vector registers — per bin only D is read and
    one complex scalar is written (the (M, N) rhs of
    :func:`pallas_fdn_solve` never exists).  The VJP runs one adjoint
    elimination (w = A^{-T} c); y is stored by the forward."""
    dr, di, u, b2, c2, M, Mp = _fdn_tf_prep(D, U, b, c)
    tr, ti, _, _ = _fdn_tf_ml(dr, di, u, b2, c2)
    return (tr + 1j * ti)[0, :M]


def _fdn_tf_fwd(D, U, b, c):
    dr, di, u, b2, c2, M, Mp = _fdn_tf_prep(D, U, b, c)
    tr, ti, yr, yi = _fdn_tf_ml(dr, di, u, b2, c2)
    return (tr + 1j * ti)[0, :M], (D, U, b, c, yr, yi)


def _fdn_tf_bwd(res, tf_bar):
    D, U, b, c, yr, yi = res
    dr, di, u, b2, c2, M, Mp = _fdn_tf_prep(D, U, b, c)
    pad = Mp - M
    tbr = jnp.real(tf_bar)[None, :]
    tbi = jnp.imag(tf_bar)[None, :]
    if pad:
        z = jnp.zeros((1, pad), tbr.dtype)
        tbr = jnp.concatenate([tbr, z], axis=1)
        tbi = jnp.concatenate([tbi, z], axis=1)
    dbr, dbi, ub, bb, cb = _fdn_tf_bwd_ml(dr, di, u, b2, c2, yr, yi,
                                          tbr, tbi)
    D_bar = jnp.transpose(dbr + 1j * dbi, (1, 0))[:M]
    U_bar = jnp.sum(ub, axis=0).astype(U.dtype)
    b_bar = jnp.sum(bb, axis=0)[:, 0].astype(b.dtype)
    c_bar = jnp.sum(cb, axis=0)[:, 0].astype(c.dtype)
    return D_bar, U_bar, b_bar, c_bar


pallas_fdn_tf.defvjp(_fdn_tf_fwd, _fdn_tf_bwd)


# ---------------------------------------------------------------------------
# fused FDN step kernel: forward solve + MSE loss + adjoint gradients in ONE
# grid pass (no y / tf round-trip through HBM, no (1, M, 1) loss chain)
# ---------------------------------------------------------------------------
def _ge_core_nopivot_factors(A, b, N):
    """In-place elimination WITHOUT pivoting; returns y and leaves the
    L/U factors in A (U in the upper triangle incl. diagonal, the unit-L
    multipliers in the emptied subdiagonal slots) — so the caller can
    solve the TRANSPOSED system by two substitutions instead of a second
    elimination (A^T = U^T L^T).  Valid for loop matrices whose leading
    pivots stay away from zero (the stable-FDN case; callers gate on a
    finite-loss check like solve_method='ge_nopivot')."""
    for k in range(N):
        pinv = _crecip(A[k][k])  # one reciprocal per pivot
        for i in range(k + 1, N):
            f = _cmul(A[i][k], pinv)
            A[i][k] = f  # store the multiplier in the emptied slot
            for j in range(k + 1, N):
                A[i][j] = _csub(A[i][j], _cmul(f, A[k][j]))
            b[i] = _csub(b[i], _cmul(f, b[k]))
    y = [None] * N
    for i in range(N - 1, -1, -1):
        acc = b[i]
        for j in range(i + 1, N):
            acc = _csub(acc, _cmul(A[i][j], y[j]))
        y[i] = _cdiv(acc, A[i][i])
    return y


def _transpose_solve_from_factors(A, c, N):
    """Solve (L U)^T w = c from the factors left in A by
    :func:`_ge_core_nopivot_factors` (U upper incl. diagonal, unit-L
    multipliers below): U^T z = c by forward substitution, then
    L^T w = z by back substitution."""
    z = [None] * N
    for i in range(N):
        acc = c[i]
        for j in range(i):
            acc = _csub(acc, _cmul(A[j][i], z[j]))
        z[i] = _cdiv(acc, A[i][i])
    w = [None] * N
    for i in range(N - 1, -1, -1):
        acc = z[i]
        for j in range(i + 1, N):
            acc = _csub(acc, _cmul(A[j][i], w[j]))
        w[i] = acc
    return w


def _fdn_tf_mse_kernel(N: int, scale: float, with_dbar: bool, pivot: bool,
                       dr_ref, di_ref, u_ref, b_ref, c_ref,
                       xr_ref, xi_ref, t_ref,
                       loss_ref, ub_ref, bb_ref, cb_ref,
                       *dbar_refs):
    """One bin-tile of loss-and-gradients:

        tf_m  = c^T (I - diag(D_m) U)^{-1} diag(D_m) b
        L     = (1/M) sum_m (|tf_m X_m| - t_m)^2      (partial sums out)
        tf_bar computed IN REGISTERS (scale = 2/M baked in), then the
        adjoint elimination w = A^{-T} c and the U/b/c(/D) cotangents of
        :func:`_fdn_tf_bwd_kernel` — while tf, y, and the per-bin loss
        chain never leave the vector registers.

    Cotangent convention (validated against jax.vjp): for the real loss,
    tf_bar = dL/d(Re tf) - i dL/d(Im tf)."""
    shape = (TILE // 128, 128)
    A, D = _assemble_fdn(N, dr_ref, di_ref, u_ref, shape)
    rhs = [(D[i][0] * b_ref[i, 0], D[i][1] * b_ref[i, 0])
           for i in range(N)]
    if pivot:
        y = _ge_core(A, rhs, N, shape)
    else:
        y = _ge_core_nopivot_factors(A, rhs, N)

    tfr = jnp.zeros(shape, dr_ref.dtype)
    tfi = jnp.zeros(shape, dr_ref.dtype)
    for i in range(N):
        tfr = tfr + c_ref[i, 0] * y[i][0]
        tfi = tfi + c_ref[i, 0] * y[i][1]

    xr = xr_ref[0].reshape(shape)
    xi = xi_ref[0].reshape(shape)
    t = t_ref[0].reshape(shape)
    zr = tfr * xr - tfi * xi
    zi = tfr * xi + tfi * xr
    a = jnp.sqrt(zr * zr + zi * zi)
    diff = a - t
    # per-bin squared error written as a vector row (Mosaic cannot store
    # scalars to VMEM); the caller sums it
    loss_ref[0] = (diff * diff).reshape(-1)
    # d/dz of (|z| - t)^2, scaled; safe divide (padded bins have a = 0,
    # diff = 0, so the select never leaks a wrong value)
    g = scale * diff / jnp.where(a > 0.0, a, 1.0)
    dzr = g * zr
    dzi = g * zi
    tb = (dzr * xr + dzi * xi, dzr * xi - dzi * xr)

    zeros = jnp.zeros(shape, dr_ref.dtype)
    rhs_c = [(c_ref[i, 0] + zeros, zeros) for i in range(N)]
    if pivot:
        At, _ = _assemble_fdn(N, dr_ref, di_ref, u_ref, shape,
                              transpose=True)
        w = _ge_core(At, rhs_c, N, shape)
    else:
        # A still holds the forward L/U factors: two substitutions
        # replace the whole second elimination (and both passes skip the
        # pivot search entirely)
        w = _transpose_solve_from_factors(A, rhs_c, N)

    if with_dbar:
        Uy = []
        for i in range(N):
            ur = jnp.zeros(shape, dr_ref.dtype)
            ui = jnp.zeros(shape, dr_ref.dtype)
            for j in range(N):
                ur = ur + u_ref[i, j] * y[j][0]
                ui = ui + u_ref[i, j] * y[j][1]
            Uy.append((ur, ui))

    bbar_rows = []
    cbar_rows = []
    ubar_rows = []
    for i in range(N):
        bb = _cmul(tb, w[i])
        if with_dbar:
            db = _cmul(bb, (Uy[i][0] + b_ref[i, 0], Uy[i][1]))
            dbar_refs[0][i] = db[0].reshape(-1)
            dbar_refs[1][i] = db[1].reshape(-1)
        bbD = _cmul(bb, D[i])
        bbar_rows.append(jnp.sum(bbD[0]))
        cbar_rows.append(jnp.sum(_cmul(tb, y[i])[0]))
        row = []
        for j in range(N):
            row.append(jnp.sum(_cmul(bbD, y[j])[0]))
        ubar_rows.append(jnp.stack(row))
    ub_ref[0] = jnp.stack(ubar_rows)
    bb_ref[0] = jnp.stack(bbar_rows).reshape(N, 1)
    cb_ref[0] = jnp.stack(cbar_rows).reshape(N, 1)


def _fdn_tf_mse_ml(dr, di, u, b, c, xr, xi, t, M_true: int,
                   with_dbar: bool, pivot: bool):
    N, Mp = dr.shape
    n_tiles = Mp // TILE
    grid = (n_tiles,)
    vec_spec = pl.BlockSpec((N, TILE), lambda m: (0, m),
                            memory_space=pltpu.VMEM)
    u_spec = pl.BlockSpec((N, N), lambda m: (0, 0),
                          memory_space=pltpu.VMEM)
    nv_spec = pl.BlockSpec((N, 1), lambda m: (0, 0),
                           memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((1, TILE), lambda m: (0, m),
                          memory_space=pltpu.VMEM)
    out_specs = [t_spec,
                 pl.BlockSpec((1, N, N), lambda m: (m, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, N, 1), lambda m: (m, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, N, 1), lambda m: (m, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((1, Mp), dr.dtype),
                 jax.ShapeDtypeStruct((n_tiles, N, N), dr.dtype),
                 jax.ShapeDtypeStruct((n_tiles, N, 1), dr.dtype),
                 jax.ShapeDtypeStruct((n_tiles, N, 1), dr.dtype)]
    if with_dbar:
        out_specs += [vec_spec, vec_spec]
        out_shape += [jax.ShapeDtypeStruct((N, Mp), dr.dtype)] * 2
    return pl.pallas_call(
        partial(_fdn_tf_mse_kernel, N, 2.0 / M_true, with_dbar, pivot),
        grid=grid,
        in_specs=[vec_spec, vec_spec, u_spec, nv_spec, nv_spec,
                  t_spec, t_spec, t_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(dr, di, u, b, c, xr, xi, t)


def _pad_row(v, Mp):
    pad = Mp - v.shape[-1]
    if pad:
        v = jnp.concatenate([v, jnp.zeros((pad,), v.dtype)])
    return v[None, :]


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fdn_tf_mse(with_dbar, pivot, D, U, b, c, X, t):
    loss, _ = _fdn_tf_mse_fwd(with_dbar, pivot, D, U, b, c, X, t)
    return loss


def _fdn_tf_mse_fwd(with_dbar, pivot, D, U, b, c, X, t):
    dr, di, u, b2, c2, M, Mp = _fdn_tf_prep(D, U, b, c)
    rdtype = dr.dtype
    xr = _pad_row(jnp.real(X).astype(rdtype), Mp)
    xi = _pad_row(jnp.imag(X).astype(rdtype), Mp)
    tp = _pad_row(t.astype(rdtype), Mp)
    outs = _fdn_tf_mse_ml(dr, di, u, b2, c2, xr, xi, tp, M, with_dbar,
                          pivot)
    lp, ub, bb, cb = outs[:4]
    loss = jnp.sum(lp) / M
    U_bar = jnp.sum(ub, axis=0).astype(U.dtype)
    b_bar = jnp.sum(bb, axis=0)[:, 0].astype(b.dtype)
    c_bar = jnp.sum(cb, axis=0)[:, 0].astype(c.dtype)
    if with_dbar:
        dbr, dbi = outs[4], outs[5]
        D_bar = jnp.transpose(dbr + 1j * dbi, (1, 0))[:M]
    else:
        D_bar = jnp.zeros_like(D)
    return loss, (D_bar, U_bar, b_bar, c_bar, X, t)


def _fdn_tf_mse_bwd(with_dbar, pivot, res, g):
    D_bar, U_bar, b_bar, c_bar, X, t = res
    return (g * D_bar, g * U_bar, g * b_bar, g * c_bar,
            jnp.zeros_like(X), jnp.zeros_like(t))


_fdn_tf_mse.defvjp(_fdn_tf_mse_fwd, _fdn_tf_mse_bwd)


def pallas_fdn_tf_mse(D, U, b, c, X, t, with_dbar: bool = True,
                      pivot: bool = True):
    """Fused training-step kernel: the scalar

        L = (1/M) sum_m (|tf_m X_m| - t_m)^2,
        tf_m = c^T (I - diag(D_m) U)^{-1} diag(D_m) b

    with its gradients w.r.t. D, U, b, c computed in the SAME grid pass
    (forward elimination, in-register loss cotangent, adjoint
    elimination).  Versus `pallas_fdn_tf` + an XLA loss, this removes
    the y (M, N) and tf (M,) HBM round-trips between forward and
    backward and the whole per-bin loss chain.

    Differentiable in D, U, b, c only — the X (input spectrum) and t
    (target magnitude) cotangents are returned as zeros (they are data
    in every training use).  with_dbar=False skips computing/storing the
    (M, N) D cotangent (delays frozen, e.g. cache_delays models) and
    returns zeros for it.  pivot=False drops the select-based partial
    pivoting AND reuses the forward L/U factors for the adjoint system
    (two substitutions instead of a second elimination) — valid when the
    leading pivots stay away from zero (stable FDN loops; gate on a
    finite-loss check like solve_method='ge_nopivot')."""
    return _fdn_tf_mse(with_dbar, pivot, D, U, b, c, X, t)


# ---------------------------------------------------------------------------
# fused SOS-cascade response kernel: H(z) = prod_k B_k(z) / prod_k A_k(z)
# ---------------------------------------------------------------------------
def _bin_phasor(nfft: int, shape, off=None):
    """z^{-1} = e^{-j 2 pi bin / nfft} for this grid program's bin tile,
    computed from iota (no (M,) phasor array in HBM).

    ``off`` (a traced f32 scalar, e.g. read from a (1, 1) operand) shifts
    the PHASOR's bin index by a global offset — this is what makes the
    iota-phasor kernels shardable over bins: under ``shard_map`` each
    device's grid covers only its local block, so the phasor must be
    evaluated at ``local index + shard offset``.  The returned ``binf``
    stays the LOCAL index (validity masks compare against local row
    counts in both the sharded and unsharded settings)."""
    pid = pl.program_id(0)
    # Mosaic's iota must be integer-typed; cast after combining
    i0 = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    t = (i0 * 128 + i1).astype(jnp.float32)
    binf = jnp.float32(TILE) * pid.astype(jnp.float32) + t
    gbin = binf if off is None else binf + off
    w = (2.0 * np.pi / nfft) * gbin
    return (jnp.cos(w), -jnp.sin(w)), binf


def _horner3(c_ref, k, n, z, P, shape):
    """Complex Horner of the real taps c_ref[:, k, n] at z (tile pair)."""
    out = (c_ref[P - 1, k, n] + jnp.zeros(shape, jnp.float32),
           jnp.zeros(shape, jnp.float32))
    for p in range(P - 2, -1, -1):
        out = _cmul(out, z)
        out = (out[0] + c_ref[p, k, n], out[1])
    return out


def _sos_cascade_fwd_kernel(P: int, K: int, N: int, nfft: int,
                            off_ref, b_ref, a_ref, hr_ref, hi_ref):
    """One bin tile of the guarded cascade response, per channel:
    H = prod_k B_k / prod_k A_k, eps where the denominator product is 0
    (the _iir_guard_prods semantics).  Taps live in registers; the
    per-section (M, K, N) responses never exist anywhere.  off_ref is
    the (1, 1) global bin offset of this call's row block (zero
    unsharded; shard_index * local_M under a bins shard_map)."""
    shape = (TILE // 128, 128)
    z, _ = _bin_phasor(nfft, shape, off_ref[0, 0])
    eps = float(np.finfo(np.float32).eps)
    for n in range(N):
        pb = (jnp.ones(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
        pa = (jnp.ones(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
        for k in range(K):
            pb = _cmul(pb, _horner3(b_ref, k, n, z, P, shape))
            pa = _cmul(pa, _horner3(a_ref, k, n, z, P, shape))
        den = _cabs2(pa)
        ok = den != 0.0
        inv = 1.0 / jnp.where(ok, den, 1.0)
        hr = jnp.where(ok, (pb[0] * pa[0] + pb[1] * pa[1]) * inv, eps)
        hi = jnp.where(ok, (pb[1] * pa[0] - pb[0] * pa[1]) * inv, 0.0)
        hr_ref[n] = hr.reshape(-1)
        hi_ref[n] = hi.reshape(-1)


def _sos_cascade_bwd_kernel(P: int, K: int, N: int, nfft: int, M_true: int,
                            off_ref, b_ref, a_ref, gr_ref, gi_ref,
                            bb_ref, ab_ref):
    """Backward tile: recompute H in registers, then per band k
        b_bar[p,k,n] =  sum_m Re(Hbar H / B_k * z^{-p})
        a_bar[p,k,n] = -sum_m Re(Hbar H / A_k * z^{-p})
    (partials per grid program, summed by the caller).  Contributions are
    masked at guarded bins (prod A == 0 -> H is the eps constant, zero
    gradient) and at the padded tail (binf/M_true stay LOCAL row
    indices/counts — only the phasor sees the off_ref global shift)."""
    shape = (TILE // 128, 128)
    z, binf = _bin_phasor(nfft, shape, off_ref[0, 0])
    zs = [z]  # z^1 .. z^{P-1}, hoisted out of the section loops
    for _ in range(2, P):
        zs.append(_cmul(zs[-1], z))
    valid = binf < float(M_true)
    bbar_rows = []
    abar_rows = []
    for n in range(N):
        pb = (jnp.ones(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
        pa = (jnp.ones(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
        for k in range(K):
            pb = _cmul(pb, _horner3(b_ref, k, n, z, P, shape))
            pa = _cmul(pa, _horner3(a_ref, k, n, z, P, shape))
        den = _cabs2(pa)
        ok = (den != 0.0) & valid
        inv = 1.0 / jnp.where(den != 0.0, den, 1.0)
        h = ((pb[0] * pa[0] + pb[1] * pa[1]) * inv,
             (pb[1] * pa[0] - pb[0] * pa[1]) * inv)
        g = (gr_ref[n].reshape(shape), gi_ref[n].reshape(shape))
        t = _cmul(g, h)
        t = (jnp.where(ok, t[0], 0.0), jnp.where(ok, t[1], 0.0))
        for c_ref, rows, sign in ((b_ref, bbar_rows, 1.0),
                                  (a_ref, abar_rows, -1.0)):
            for k in range(K):
                sec = _horner3(c_ref, k, n, z, P, shape)
                d = _cabs2(sec)
                okd = d > 0.0
                invd = 1.0 / jnp.where(okd, d, 1.0)
                # t / sec, zeroed where the section response is 0;
                # only Re(t/sec * z^p) is ever reduced
                tr = jnp.where(okd, (t[0] * sec[0] + t[1] * sec[1]) * invd,
                               0.0)
                ti = jnp.where(okd, (t[1] * sec[0] - t[0] * sec[1]) * invd,
                               0.0)
                vals = [jnp.sum(tr)]
                for zp in zs:
                    vals.append(jnp.sum(tr * zp[0] - ti * zp[1]))
                rows.append(sign * jnp.stack(vals))
    # rows are ordered n-major, k-minor with P entries each -> (N*K, P)
    bb_ref[0] = jnp.stack(bbar_rows)
    ab_ref[0] = jnp.stack(abar_rows)


def _sos_cascade_prep(b, a):
    P, K, N = b.shape
    return (b.astype(jnp.float32).reshape(P, K, N),
            a.astype(jnp.float32).reshape(P, K, N), P, K, N)


def _off_operand(off):
    """(1, 1) f32 bin-offset operand + its constant-index BlockSpec."""
    arr = (jnp.zeros((1, 1), jnp.float32) if off is None
           else jnp.asarray(off, jnp.float32).reshape(1, 1))
    spec = pl.BlockSpec((1, 1), lambda m: (0, 0),
                        memory_space=pltpu.VMEM)
    return arr, spec


def _sos_cascade_call(b, a, nfft, M_true, backward, g=None, off=None):
    P, K, N = b.shape
    M = nfft // 2 + 1
    Mp = ((M + TILE - 1) // TILE) * TILE
    n_tiles = Mp // TILE
    grid = (n_tiles,)
    offa, off_spec = _off_operand(off)
    coef_spec = pl.BlockSpec((P, K, N), lambda m: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((N, TILE), lambda m: (0, m),
                            memory_space=pltpu.VMEM)
    if not backward:
        hr, hi = pl.pallas_call(
            partial(_sos_cascade_fwd_kernel, P, K, N, nfft),
            grid=grid,
            in_specs=[off_spec, coef_spec, coef_spec],
            out_specs=[vec_spec, vec_spec],
            out_shape=[jax.ShapeDtypeStruct((N, Mp), jnp.float32)] * 2,
            interpret=_interpret(),
        )(offa, b, a)
        return jnp.transpose((hr + 1j * hi)[:, :M], (1, 0))
    part_spec = pl.BlockSpec((1, N * K, P), lambda m: (m, 0, 0),
                             memory_space=pltpu.VMEM)
    gr = jnp.concatenate(
        [jnp.real(g).T.astype(jnp.float32),
         jnp.zeros((N, Mp - M), jnp.float32)], axis=1)
    gi = jnp.concatenate(
        [jnp.imag(g).T.astype(jnp.float32),
         jnp.zeros((N, Mp - M), jnp.float32)], axis=1)
    bb, ab = pl.pallas_call(
        partial(_sos_cascade_bwd_kernel, P, K, N, nfft, M),
        grid=grid,
        in_specs=[off_spec, coef_spec, coef_spec, vec_spec, vec_spec],
        out_specs=[part_spec, part_spec],
        out_shape=[jax.ShapeDtypeStruct((n_tiles, N * K, P), jnp.float32)]
        * 2,
        interpret=_interpret(),
    )(offa, b, a, gr, gi)
    # (n_tiles, N*K, P) -> (P, K, N)
    def fold(x):
        s = jnp.sum(x, axis=0).reshape(N, K, P)
        return jnp.transpose(s, (2, 1, 0))
    return fold(bb), fold(ab)


def _sos_bwd_rows(b, a, gr, gi, nfft: int, M_true: int, off=None):
    """Tap cotangents from PRE-FORMED Gam-cotangent rows (N, Mp) —
    the standalone backward kernel of :func:`pallas_sos_cascade`, used
    by the hybrid attenuated step (fuse_taps=False).  Returns
    (bt_bar, at_bar) each (P, K, N)."""
    P, K, N = b.shape
    Mp = gr.shape[-1]
    n_tiles = Mp // TILE
    grid = (n_tiles,)
    offa, off_spec = _off_operand(off)
    coef_spec = pl.BlockSpec((P, K, N), lambda m: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((N, TILE), lambda m: (0, m),
                            memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec((1, N * K, P), lambda m: (m, 0, 0),
                             memory_space=pltpu.VMEM)
    bb, ab = pl.pallas_call(
        partial(_sos_cascade_bwd_kernel, P, K, N, nfft, M_true),
        grid=grid,
        in_specs=[off_spec, coef_spec, coef_spec, vec_spec, vec_spec],
        out_specs=[part_spec, part_spec],
        out_shape=[jax.ShapeDtypeStruct((n_tiles, N * K, P), jnp.float32)]
        * 2,
        interpret=_interpret(),
    )(offa, b, a, gr, gi)

    def fold(x):
        s = jnp.sum(x, axis=0).reshape(N, K, P)
        return jnp.transpose(s, (2, 1, 0))

    return fold(bb), fold(ab)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _sos_cascade(b, a, nfft, off):
    b, a, P, K, N = _sos_cascade_prep(b, a)
    return _sos_cascade_call(b, a, nfft, None, backward=False, off=off)


def _sos_cascade_vfwd(b, a, nfft, off):
    return _sos_cascade(b, a, nfft, off), (b, a, off)


def _sos_cascade_vbwd(nfft, res, g):
    b, a, off = res
    b2, a2, P, K, N = _sos_cascade_prep(b, a)
    bb, ab = _sos_cascade_call(b2, a2, nfft, None, backward=True, g=g,
                               off=off)
    return (bb.astype(b.dtype).reshape(b.shape),
            ab.astype(a.dtype).reshape(a.shape), jnp.zeros_like(off))


_sos_cascade.defvjp(_sos_cascade_vfwd, _sos_cascade_vbwd)


def pallas_sos_cascade(b, a, nfft, bin_offset=None):
    """Guarded SOS-cascade frequency response in ONE Pallas kernel:

        H_n(z_m) = prod_k B_{k,n}(z_m) / prod_k A_{k,n}(z_m)

    b, a: (P, K, N) real taps (any envelope pre-applied); returns
    (M, N) complex with the `_iir_guard_prods` eps semantics.  The
    phasor, every section response, and the running products live in
    vector registers — the XLA cascade chain materializes ~4 (M, N)
    intermediates per section per direction, which is what dominates
    the attenuated-FDN step.  The VJP recomputes the cascade in-kernel
    and reduces the (P, K, N) coefficient cotangents per tile.

    ``bin_offset`` (traced f32 scalar, default 0) shifts the phasor's
    bin index: row j is evaluated at global bin ``j + bin_offset``.
    This is what lets the kernel run per-shard under a bins
    ``shard_map`` (pass ``axis_index * local_M``); it also evaluates
    response slices directly."""
    off = (jnp.zeros((), jnp.float32) if bin_offset is None
           else jnp.asarray(bin_offset, jnp.float32))
    return _sos_cascade(b, a, nfft, off)


# ---------------------------------------------------------------------------
# fused ATTENUATED-FDN step kernel: SOS-cascade attenuation evaluated INSIDE
# the solve + MSE loss + adjoint gradients in ONE grid pass.  This is the
# reference's realistic FDN workload (examples/e8_fdn.py:32-184 — GEQ/PEQ
# attenuation in the feedback path) fused the way pallas_fdn_tf_mse fused
# the colorless one: the (M, N) attenuation response, the (M, N) rhs, y,
# tf, and every cotangent between them stay in vector registers.
# ---------------------------------------------------------------------------
def _cascade_tile(b_ref, a_ref, n, z, P, K, shape, keep_secs=False):
    """Guarded cascade response for channel n at this tile's phasor:
    returns (Gam, pa_ok) — the response pair and the denominator-nonzero
    mask (the _iir_guard_prods eps semantics).  keep_secs=True also
    returns the per-section (B_k, A_k) response tiles so an adjoint
    pass can reuse them instead of recomputing the Horners."""
    pb = (jnp.ones(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
    pa = (jnp.ones(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
    secs = []
    for k in range(K):
        Bk = _horner3(b_ref, k, n, z, P, shape)
        Ak = _horner3(a_ref, k, n, z, P, shape)
        if keep_secs:
            secs.append((Bk, Ak))
        pb = _cmul(pb, Bk)
        pa = _cmul(pa, Ak)
    den = _cabs2(pa)
    ok = den != 0.0
    inv = 1.0 / jnp.where(ok, den, 1.0)
    eps = float(np.finfo(np.float32).eps)
    gr = jnp.where(ok, (pb[0] * pa[0] + pb[1] * pa[1]) * inv, eps)
    gi = jnp.where(ok, (pb[1] * pa[0] - pb[0] * pa[1]) * inv, 0.0)
    if keep_secs:
        return (gr, gi), ok, secs
    return (gr, gi), ok


def _fdn_sos_tf_mse_kernel(N: int, K: int, P: int, nfft: int, scale: float,
                           with_dbar: bool, pivot: bool, fuse_taps: bool,
                           off_ref, dr_ref, di_ref, bt_ref, at_ref, u_ref,
                           b_ref, c_ref, xr_ref, xi_ref, t_ref,
                           loss_ref, ub_ref, bb_ref, cb_ref,
                           *rest_refs):
    """One bin-tile of the attenuated-FDN loss-and-gradients:

        Gam_mn = prod_k B_kn(z_m) / prod_k A_kn(z_m)      (SOS attenuation)
        tf_m   = c^T (I - diag(D_m Gam_m) U)^{-1} diag(D_m) b
        L      = (1/M) sum_m (|tf_m X_m| - t_m)^2

    with cotangents for U, b, c, the SOS taps (and optionally D) computed
    in the SAME pass.  The attenuation enters the LOOP MATRIX only (the
    rhs injection is the bare delay response diag(D) b — reference FDN
    structure: delays feed forward, mixing+attenuation feed back).

    Chain (unconjugated-transpose convention, tf_bar = dL/dRe - i dL/dIm):
        bb_i       = tf_bar w_i            with A^T w = c
        (DGam)_bar = bb_i (U y)_i
        Gam_bar_i  = (DGam)_bar_i D_i ,  D_bar_i = (DGam)_bar_i Gam_i
                                                   + bb_i b_i
        taps: t_n = Gam_bar_n Gam_n, then per section
              b_bar[p,k,n] =  sum_m Re(t_n / B_kn z^{-p})
              a_bar[p,k,n] = -sum_m Re(t_n / A_kn z^{-p})
    Padded bins contribute nothing (D, X, t zero-padded => tf_bar = 0).

    Structured in two phases: phase 1 (cascade + solve + loss + U/b/c
    heads) holds the factored loop matrix and solution vectors live;
    phase 2 (the 2*K*N tap-cotangent section loop) holds only the N
    per-channel Gam-cotangent tiles and the hoisted z powers.  Measured
    NEUTRAL vs the interleaved layout (1150 us/step both ways at
    N=6, K=12 — Mosaic's scheduler already bounded liveness); kept for
    the smaller live set and readability.  Phase 2 dominates the kernel
    (the colorless step kernel, which is this kernel minus phase 2,
    runs ~34 us).  Phase-2 structure is dictated by a measured Mosaic
    pathology (bisected on-chip 2026-08-17): per-section
    jnp.sum-to-scalar + jnp.stack cost ~2.3 us PER REDUCE inside this
    kernel (432 reduces -> 1150 us/step; phase 2 stubbed -> 67.7;
    per-section count capped -> linear in sections; tile-accumulate
    without scalar reduces -> 156 us), even though the IDENTICAL loop
    in _sos_cascade_bwd_kernel reduces at full speed.  So phase 2 keeps
    all per-section q tiles and reduces ONCE per tap power over the
    concatenated (N*K*8, 128) array (lane reduce -> (N*K*8, 1)
    partials); XLA folds the 8 sublane partials and the grid axis.  tn
    is handed phase1->phase2 through an explicit VMEM scratch (the
    trailing two refs) — measured neutral, kept for the bounded live
    set.

    fuse_taps=False drops phase 2: the kernel emits the per-channel
    Gam-cotangent rows (gambar, Gok-masked) as outputs for the
    standalone `_sos_cascade_bwd_kernel`.  Measured SLOWER end to end
    (3070 vs 3979 steps/s — the Horner recompute + HBM round-trip beats
    phase 2's overhead); kept as an option."""
    if fuse_taps:
        tap_ref = rest_refs[0]
        rest_refs = rest_refs[1:]
        if with_dbar:
            dbar_refs = rest_refs[:2]
            tnr_ref, tni_ref = rest_refs[2:]
        else:
            dbar_refs = ()
            tnr_ref, tni_ref = rest_refs
    else:
        gbr_ref, gbi_ref = rest_refs[:2]
        dbar_refs = rest_refs[2:] if with_dbar else ()
    shape = (TILE // 128, 128)
    z, _ = _bin_phasor(nfft, shape, off_ref[0, 0])
    zs = [z]  # z^1 .. z^{P-1}, hoisted out of the section loops
    for _ in range(2, P):
        zs.append(_cmul(zs[-1], z))

    D = [(dr_ref[i].reshape(shape), di_ref[i].reshape(shape))
         for i in range(N)]
    Gam = []
    Gok = []
    all_secs = []
    for n in range(N):
        if fuse_taps:
            g, ok, secs = _cascade_tile(bt_ref, at_ref, n, z, P, K, shape,
                                        keep_secs=True)
        else:
            g, ok = _cascade_tile(bt_ref, at_ref, n, z, P, K, shape)
            secs = []
        Gam.append(g)
        Gok.append(ok)
        all_secs.append(secs)
    Dp = [_cmul(D[i], Gam[i]) for i in range(N)]

    A = []
    for i in range(N):
        row = []
        for j in range(N):
            re = -Dp[i][0] * u_ref[i, j]
            im = -Dp[i][1] * u_ref[i, j]
            if i == j:
                re = re + 1.0
            row.append((re, im))
        A.append(row)
    rhs = [(D[i][0] * b_ref[i, 0], D[i][1] * b_ref[i, 0])
           for i in range(N)]
    if pivot:
        Asolve = [list(r) for r in A]
        y = _ge_core(Asolve, rhs, N, shape)
    else:
        y = _ge_core_nopivot_factors(A, rhs, N)

    tfr = jnp.zeros(shape, dr_ref.dtype)
    tfi = jnp.zeros(shape, dr_ref.dtype)
    for i in range(N):
        tfr = tfr + c_ref[i, 0] * y[i][0]
        tfi = tfi + c_ref[i, 0] * y[i][1]

    xr = xr_ref[0].reshape(shape)
    xi = xi_ref[0].reshape(shape)
    t = t_ref[0].reshape(shape)
    zr = tfr * xr - tfi * xi
    zi = tfr * xi + tfi * xr
    a = jnp.sqrt(zr * zr + zi * zi)
    diff = a - t
    loss_ref[0] = (diff * diff).reshape(-1)
    g = scale * diff / jnp.where(a > 0.0, a, 1.0)
    dzr = g * zr
    dzi = g * zi
    tb = (dzr * xr + dzi * xi, dzr * xi - dzi * xr)

    zeros = jnp.zeros(shape, dr_ref.dtype)
    rhs_c = [(c_ref[i, 0] + zeros, zeros) for i in range(N)]
    if pivot:
        At = []
        for i in range(N):
            row = []
            for j in range(N):
                re = -Dp[j][0] * u_ref[j, i]
                im = -Dp[j][1] * u_ref[j, i]
                if i == j:
                    re = re + 1.0
                row.append((re, im))
            At.append(row)
        w = _ge_core(At, rhs_c, N, shape)
    else:
        w = _transpose_solve_from_factors(A, rhs_c, N)

    Uy = []
    for i in range(N):
        ur = jnp.zeros(shape, dr_ref.dtype)
        ui = jnp.zeros(shape, dr_ref.dtype)
        for j in range(N):
            ur = ur + u_ref[i, j] * y[j][0]
            ui = ui + u_ref[i, j] * y[j][1]
        Uy.append((ur, ui))

    bbar_rows = []
    cbar_rows = []
    ubar_rows = []
    for i in range(N):
        bb = _cmul(tb, w[i])
        dpbar = _cmul(bb, Uy[i])
        gambar = _cmul(dpbar, D[i])
        if with_dbar:
            db = _cmul(dpbar, Gam[i])
            db = (db[0] + bb[0] * b_ref[i, 0], db[1] + bb[1] * b_ref[i, 0])
            dbar_refs[0][i] = db[0].reshape(-1)
            dbar_refs[1][i] = db[1].reshape(-1)
        bbar_rows.append(jnp.sum(_cmul(bb, D[i])[0]))
        cbar_rows.append(jnp.sum(_cmul(tb, y[i])[0]))
        bbDp = _cmul(bb, Dp[i])
        row = []
        for j in range(N):
            row.append(jnp.sum(_cmul(bbDp, y[j])[0]))
        ubar_rows.append(jnp.stack(row))

        if fuse_taps:
            # Gam cotangent for this channel (zero where the cascade
            # denominator vanished -> the response is the eps constant),
            # spilled to scratch: see the docstring on the phase handoff
            tn = _cmul(gambar, Gam[i])
            tnr_ref[i] = jnp.where(Gok[i], tn[0], 0.0).reshape(TILE)
            tni_ref[i] = jnp.where(Gok[i], tn[1], 0.0).reshape(TILE)
        else:
            # emit gambar rows for the standalone cascade-bwd kernel
            # (it recomputes Gam and forms t = gambar Gam itself)
            gbr_ref[i] = jnp.where(Gok[i], gambar[0], 0.0).reshape(TILE)
            gbi_ref[i] = jnp.where(Gok[i], gambar[1], 0.0).reshape(TILE)

    ub_ref[0] = jnp.stack(ubar_rows)
    bb_ref[0] = jnp.stack(bbar_rows).reshape(N, 1)
    cb_ref[0] = jnp.stack(cbar_rows).reshape(N, 1)

    if not fuse_taps:
        return

    # phase 2: SOS tap cotangents — only tn_list and zs are live here;
    # only the real part of t/sec * z^p is ever reduced.
    # Per-section jnp.sum-to-scalar + stack was the pathology (see the
    # docstring): instead keep every section's q tiles and emit ONE
    # lane-reduce per tap power over the concatenated (N*K*8, 128)
    # array, leaving the final 8-partial fold to XLA.  Row order:
    # (pass b/a, channel-major, section-minor, sublane).
    # The (1, 2P, N*K*sub, 1) tap block is REVISITED by every grid
    # program (constant index map): accumulate in VMEM across the grid
    # so XLA only folds sublanes — the XLA-side grid-axis reduce of
    # (n_tiles, 2P, N*K*sub, 1) partials measured 65 us/step.
    pid = pl.program_id(0)
    qrs = []
    qis = []
    # both passes (b: +, a: -) in ONE concatenated array — the sign is
    # folded into q, halving the reduce count (6 -> P)
    for part, sign in ((0, 1.0), (1, -1.0)):
        for i in range(N):
            tn = (tnr_ref[i].reshape(shape), tni_ref[i].reshape(shape))
            for k in range(K):
                sec = all_secs[i][k][part]  # reused from phase 1
                d = _cabs2(sec)
                okd = d > 0.0
                invd = sign / jnp.where(okd, d, 1.0)
                qrs.append(jnp.where(okd, (tn[0] * sec[0] + tn[1] * sec[1])
                                     * invd, 0.0))
                qis.append(jnp.where(okd, (tn[1] * sec[0] - tn[0] * sec[1])
                                     * invd, 0.0))
    bqr = jnp.concatenate(qrs, axis=0)  # (2*N*K*sub, 128)
    bqi = jnp.concatenate(qis, axis=0)
    reps = len(qrs)
    vals = [jnp.sum(bqr, axis=1, keepdims=True)]
    for zp in zs:
        bzr = jnp.concatenate([zp[0]] * reps, axis=0)
        bzi = jnp.concatenate([zp[1]] * reps, axis=0)
        vals.append(jnp.sum(bqr * bzr - bqi * bzi, axis=1,
                            keepdims=True))

    @pl.when(pid == 0)
    def _init(vals=vals):
        for p, v in enumerate(vals):
            tap_ref[0, p] = v

    @pl.when(pid > 0)
    def _acc(vals=vals):
        for p, v in enumerate(vals):
            tap_ref[0, p] = tap_ref[0, p] + v


def _fdn_sos_tf_mse_ml(dr, di, bt, at, u, b, c, xr, xi, t, nfft: int,
                       M_true: int, with_dbar: bool, pivot: bool,
                       fuse_taps: bool, off=None):
    N, Mp = dr.shape
    P, K, _ = bt.shape
    n_tiles = Mp // TILE
    grid = (n_tiles,)
    offa, off_spec = _off_operand(off)
    vec_spec = pl.BlockSpec((N, TILE), lambda m: (0, m),
                            memory_space=pltpu.VMEM)
    coef_spec = pl.BlockSpec((P, K, N), lambda m: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    u_spec = pl.BlockSpec((N, N), lambda m: (0, 0),
                          memory_space=pltpu.VMEM)
    nv_spec = pl.BlockSpec((N, 1), lambda m: (0, 0),
                           memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((1, TILE), lambda m: (0, m),
                          memory_space=pltpu.VMEM)
    sub = TILE // 128
    out_specs = [t_spec,
                 pl.BlockSpec((1, N, N), lambda m: (m, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, N, 1), lambda m: (m, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, N, 1), lambda m: (m, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((1, Mp), dr.dtype),
                 jax.ShapeDtypeStruct((n_tiles, N, N), dr.dtype),
                 jax.ShapeDtypeStruct((n_tiles, N, 1), dr.dtype),
                 jax.ShapeDtypeStruct((n_tiles, N, 1), dr.dtype)]
    scratch = []
    if fuse_taps:
        # tap-cotangent partials: P rows (per tap power) of
        # (2*N*K*sub, 1) lane-reduced sums (b then a, sign folded) —
        # the caller folds sublanes (grid already accumulated in-kernel)
        out_specs.append(pl.BlockSpec((1, P, 2 * N * K * sub, 1),
                                      lambda m: (0, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, P, 2 * N * K * sub, 1),
                                              dr.dtype))
        # tn phase-handoff scratch: see the kernel docstring
        scratch = [pltpu.VMEM((N, TILE), jnp.float32)] * 2
    else:
        # gambar rows for the standalone cascade-bwd kernel
        out_specs += [vec_spec, vec_spec]
        out_shape += [jax.ShapeDtypeStruct((N, Mp), dr.dtype)] * 2
    if with_dbar:
        out_specs += [vec_spec, vec_spec]
        out_shape += [jax.ShapeDtypeStruct((N, Mp), dr.dtype)] * 2
    return pl.pallas_call(
        partial(_fdn_sos_tf_mse_kernel, N, K, P, nfft, 2.0 / M_true,
                with_dbar, pivot, fuse_taps),
        grid=grid,
        in_specs=[off_spec, vec_spec, vec_spec, coef_spec, coef_spec,
                  u_spec, nv_spec, nv_spec, t_spec, t_spec, t_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(offa, dr, di, bt, at, u, b, c, xr, xi, t)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fdn_sos_tf_mse(nfft, with_dbar, pivot, fuse_taps, D, bt, at, U, b, c,
                    X, t, off):
    loss, _ = _fdn_sos_tf_mse_fwd(nfft, with_dbar, pivot, fuse_taps, D,
                                  bt, at, U, b, c, X, t, off)
    return loss


def _fdn_sos_tf_mse_fwd(nfft, with_dbar, pivot, fuse_taps, D, bt, at, U,
                        b, c, X, t, off):
    M, N = D.shape
    Mp = ((M + TILE - 1) // TILE) * TILE
    pad = Mp - M
    Dt = jnp.transpose(D, (1, 0))
    if pad:
        Dt = jnp.concatenate([Dt, jnp.zeros((N, pad), Dt.dtype)], axis=1)
    rdtype = jnp.real(D).dtype
    bt2 = bt.astype(jnp.float32)
    at2 = at.astype(jnp.float32)
    xr = _pad_row(jnp.real(X).astype(rdtype), Mp)
    xi = _pad_row(jnp.imag(X).astype(rdtype), Mp)
    tp = _pad_row(t.astype(rdtype), Mp)
    outs = _fdn_sos_tf_mse_ml(
        jnp.real(Dt), jnp.imag(Dt), bt2, at2, U.astype(rdtype),
        b.astype(rdtype)[:, None], c.astype(rdtype)[:, None],
        xr, xi, tp, nfft, M, with_dbar, pivot, fuse_taps, off=off)
    lp, ub, bbp, cbp = outs[:4]
    P, K, _ = bt.shape
    loss = jnp.sum(lp) / M
    U_bar = jnp.sum(ub, axis=0).astype(U.dtype)
    b_bar = jnp.sum(bbp, axis=0)[:, 0].astype(b.dtype)
    c_bar = jnp.sum(cbp, axis=0)[:, 0].astype(c.dtype)

    if fuse_taps:
        # fold the (1, P, 2*N*K*sub, 1) lane partials (grid already
        # accumulated in-kernel): sublane sums only, rows are pass-major
        # (b then a, sign folded in-kernel), channel-major, section-minor
        tparts = outs[4]
        rest = outs[5:]
        folded = tparts[0, ..., 0].reshape(P, 2, N, K, TILE // 128)
        folded = jnp.sum(folded, axis=-1)  # (P, 2, N, K)
        folded = jnp.transpose(folded, (1, 0, 3, 2))  # (2, P, K, N)
        bt_bar = folded[0].astype(bt.dtype)
        at_bar = folded[1].astype(at.dtype)
    else:
        # hand the gambar rows to the standalone cascade-bwd kernel —
        # identical math, but the dedicated kernel reduces at full speed
        # while the in-kernel phase 2 pays ~100 us of Mosaic scheduling
        # overhead (profiled 2026-08-18)
        gbr, gbi = outs[4], outs[5]
        rest = outs[6:]
        bbt, abt = _sos_bwd_rows(bt2, at2, gbr, gbi, nfft, M, off=off)
        bt_bar = bbt.astype(bt.dtype)
        at_bar = abt.astype(at.dtype)
    if with_dbar:
        dbr, dbi = rest[0], rest[1]
        D_bar = jnp.transpose(dbr + 1j * dbi, (1, 0))[:M]
    else:
        D_bar = jnp.zeros_like(D)
    return loss, (D_bar, bt_bar, at_bar, U_bar, b_bar, c_bar, X, t, off)


def _fdn_sos_tf_mse_bwd(nfft, with_dbar, pivot, fuse_taps, res, g):
    D_bar, bt_bar, at_bar, U_bar, b_bar, c_bar, X, t, off = res
    return (g * D_bar, g * bt_bar, g * at_bar, g * U_bar, g * b_bar,
            g * c_bar, jnp.zeros_like(X), jnp.zeros_like(t),
            jnp.zeros_like(off))


_fdn_sos_tf_mse.defvjp(_fdn_sos_tf_mse_fwd, _fdn_sos_tf_mse_bwd)


def pallas_fdn_sos_tf_mse(D, bt, at, U, b, c, X, t, nfft: int,
                          with_dbar: bool = False, pivot: bool = False,
                          fuse_taps: bool = True, bin_offset=None):
    """Fused attenuated-FDN training-step kernel: the scalar

        L = (1/M) sum_m (|tf_m X_m| - t_m)^2,
        tf_m = c^T (I - diag(D_m Gam_m) U)^{-1} diag(D_m) b,
        Gam_mn = prod_k B_kn(z_m) / prod_k A_kn(z_m)

    with gradients w.r.t. the SOS taps bt/at (P, K, N), U, b, c (and
    optionally D) in ONE Pallas grid pass: the per-channel SOS-cascade
    attenuation (reference e8_fdn's GEQ-in-the-loop, e8_fdn.py:32-184)
    is evaluated from its taps in registers, folded into the loop
    diagonal, solved, projected, and differentiated without the (M, N)
    attenuation response, rhs, y, tf, or any of their cotangents
    touching HBM.  Guard semantics match _iir_guard_prods (eps where the
    denominator product vanishes, zero gradient there).

    Differentiable in D, bt, at, U, b, c; X/t are data (zero cotangent).
    pivot=False reuses the forward no-pivot L/U factors for the adjoint
    (valid for stable FDN loops; gate on a finite-loss check).

    fuse_taps=False computes the tap cotangents in a SECOND dedicated
    kernel launch (the standalone cascade-bwd kernel) from gambar rows
    emitted by the main pass — identical math, but measured SLOWER end
    to end (3070 vs 3979 steps/s on-chip, 2026-08-18): the second
    launch re-runs all 2*K*N section Horners and round-trips the (N, M)
    cotangent rows through HBM, which costs more than the in-kernel
    phase 2's scheduling overhead.  Kept as an option/diagnostic; the
    default stays single-launch.

    ``bin_offset`` (traced f32 scalar, default 0) shifts the in-kernel
    phasor's bin index so row j of D/X/t is treated as global bin
    ``j + bin_offset`` — pass ``axis_index * local_M`` to run this
    kernel per-shard under a bins ``shard_map`` (the loss partial is
    normalized by the LOCAL row count; renormalize across shards as
    ``psum(part * local_M) / global_M``, see parallel.fused)."""
    off = (jnp.zeros((), jnp.float32) if bin_offset is None
           else jnp.asarray(bin_offset, jnp.float32))
    return _fdn_sos_tf_mse(nfft, with_dbar, pivot, fuse_taps, D, bt, at,
                           U, b, c, X, t, off)


# ---------------------------------------------------------------------------
# fused active-acoustics step kernel: rectangular-product loop solve +
# magnitude-MSE loss + mixer-response cotangent in ONE grid pass
# ---------------------------------------------------------------------------
def _aa_tf_mse_kernel(N: int, L: int, scale: float, pivot: bool,
                      hr_ref, hi_ref, gr_ref, gi_ref, rr_ref, ri_ref,
                      t_ref, loss_ref, sgr_ref, sgi_ref):
    """One bin-tile of the active-acoustics loss-and-gradients
    (reference examples/e8_active_acoustics.py:671-750 workload):

        A_m = I_N - H_m G_m          (H: N x L frozen room, G: L x N mixer)
        y_m = A_m^{-1} r_m           (r = H X, frozen: X is data)
        Lss = sum_{m,i} (|y_mi| - t_mi)^2  (partial rows out; caller
                                            divides by M_true * N)

    and the mixer-response cotangent via one adjoint solve:

        w_i  = scale * (|y_i| - t_i)/|y_i| * conj(y_i)
        A^T xi = w                   (transpose, NOT conjugate-transpose)
        S_jk = (H^T xi)_j y_k        (S-number rows out)

    with the convention dLss/d(Re G) = Re S, dLss/d(Im G) = -Im S
    (cotangents transform by the unconjugated transpose, same as the
    FDN kernels above).  H and the rhs are frozen (room and input): no
    cotangents are produced for them.  Padded bins have H = G = r = t =
    0 => A = I, y = 0, diff = 0: they contribute nothing to either
    output."""
    shape = (TILE // 128, 128)
    H = [[(hr_ref[i * L + j].reshape(shape),
           hi_ref[i * L + j].reshape(shape)) for j in range(L)]
         for i in range(N)]
    G = [[(gr_ref[j * N + k].reshape(shape),
           gi_ref[j * N + k].reshape(shape)) for k in range(N)]
         for j in range(L)]

    A = []
    for i in range(N):
        row = []
        for k in range(N):
            sr = jnp.zeros(shape, hr_ref.dtype)
            si = jnp.zeros(shape, hr_ref.dtype)
            for j in range(L):
                p = _cmul(H[i][j], G[j][k])
                sr = sr + p[0]
                si = si + p[1]
            eye = 1.0 if i == k else 0.0
            row.append((eye - sr, -si))
        A.append(row)
    if pivot:
        A0 = [[A[i][k] for k in range(N)] for i in range(N)]

    rhs = [(rr_ref[i].reshape(shape), ri_ref[i].reshape(shape))
           for i in range(N)]
    if pivot:
        y = _ge_core(A, rhs, N, shape)
    else:
        y = _ge_core_nopivot_factors(A, rhs, N)

    losses = jnp.zeros(shape, hr_ref.dtype)
    w = []
    for i in range(N):
        est = jnp.sqrt(_cabs2(y[i]))
        diff = est - t_ref[i].reshape(shape)
        losses = losses + diff * diff
        # safe divide: padded/zero bins have est = 0 AND diff = 0
        g = scale * diff / jnp.where(est > 0.0, est, 1.0)
        w.append((g * y[i][0], -g * y[i][1]))
    loss_ref[0] = losses.reshape(-1)

    if pivot:
        At = [[A0[i][k] for i in range(N)] for k in range(N)]
        xi = _ge_core(At, w, N, shape)
    else:
        # A holds the forward no-pivot L/U factors: two substitutions
        # replace the second elimination
        xi = _transpose_solve_from_factors(A, w, N)

    for j in range(L):
        ar = jnp.zeros(shape, hr_ref.dtype)
        ai = jnp.zeros(shape, hr_ref.dtype)
        for i in range(N):
            p = _cmul(H[i][j], xi[i])
            ar = ar + p[0]
            ai = ai + p[1]
        for k in range(N):
            s = _cmul((ar, ai), y[k])
            sgr_ref[j * N + k] = s[0].reshape(-1)
            sgi_ref[j * N + k] = s[1].reshape(-1)


def _aa_tf_mse_ml(N, L, pivot, hr, hi, gr, gi, rr, ri, t, M_true: int):
    Mp = hr.shape[-1]
    grid = (Mp // TILE,)

    def rows(R):
        return pl.BlockSpec((R, TILE), lambda m: (0, m),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_aa_tf_mse_kernel, N, L, 2.0 / (M_true * N), pivot),
        grid=grid,
        in_specs=[rows(N * L), rows(N * L), rows(L * N), rows(L * N),
                  rows(N), rows(N), rows(N)],
        out_specs=[rows(1), rows(L * N), rows(L * N)],
        out_shape=[jax.ShapeDtypeStruct((1, Mp), hr.dtype),
                   jax.ShapeDtypeStruct((L * N, Mp), hr.dtype),
                   jax.ShapeDtypeStruct((L * N, Mp), hr.dtype)],
        interpret=_interpret(),
    )(hr, hi, gr, gi, rr, ri, t)


def _pad_rows(v, Mp):
    pad = Mp - v.shape[-1]
    if pad:
        v = jnp.concatenate([v, jnp.zeros(v.shape[:-1] + (pad,), v.dtype)],
                            axis=-1)
    return v


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _aa_tf_mse(N, L, pivot, hr, hi, gr, gi, rr, ri, t):
    loss, _ = _aa_tf_mse_fwd(N, L, pivot, hr, hi, gr, gi, rr, ri, t)
    return loss


def _aa_tf_mse_fwd(N, L, pivot, hr, hi, gr, gi, rr, ri, t):
    M = hr.shape[-1]
    Mp = ((M + TILE - 1) // TILE) * TILE
    lp, sgr, sgi = _aa_tf_mse_ml(
        N, L, pivot, _pad_rows(hr, Mp), _pad_rows(hi, Mp),
        _pad_rows(gr, Mp), _pad_rows(gi, Mp), _pad_rows(rr, Mp),
        _pad_rows(ri, Mp), _pad_rows(t, Mp), M)
    loss = jnp.sum(lp) / (M * N)
    return loss, (sgr[:, :M], sgi[:, :M], hr, rr, t)


def _aa_tf_mse_bwd(N, L, pivot, res, g):
    sgr, sgi, hr, rr, t = res
    zh = jnp.zeros_like(hr)
    zr = jnp.zeros_like(rr)
    return (zh, zh, g * sgr, -(g * sgi), zr, zr, jnp.zeros_like(t))


_aa_tf_mse.defvjp(_aa_tf_mse_fwd, _aa_tf_mse_bwd)


def _aa_taps_tf_mse_kernel(N: int, L: int, order: int, nfft: int,
                           scale: float, pivot: bool, precision: str,
                           off_ref, hr_ref, hi_ref, tw_ref, rr_ref,
                           ri_ref, t_ref, loss_ref, tb_ref):
    """Taps-in variant of :func:`_aa_tf_mse_kernel`: the mixer RESPONSE
    never exists in HBM.  Per bin tile the kernel

    1. builds the DFT power stack ``P[t] = e^{-j 2 pi t m / nfft}``
       (t = 0..order-1) from the iota phasor by LOG-DOUBLING (rows
       [r, 2r) = rows [0, r) * z^r, z^r by repeated squaring —
       ~log2(order) vectorized rounds, drift ~log(order)*eps),
    2. forms the mixer response rows with ONE MXU matmul
       ``[G_re | G_im] = tw^T [P_re | P_im]`` (tw = envelope-folded
       taps, (order, L*N)),
    3. runs the same assembly/solve/loss/adjoint as the response-rows
       kernel, and
    4. contracts the S-number cotangent rows straight back onto the tap
       axis (``tb = [P_re | P_im] [S_re | -S_im]^T``, one MXU matmul),
       ACCUMULATED across the grid in a revisited output block.

    Rationale (profiled 2026-08-19): the response-rows path spent
    115 us/step in four XLA basis matmuls plus ~30 us of pads.  Those
    matmuls are PRECISION-PASS-BOUND, not bandwidth-bound (2 GFLOP at
    HIGHEST = 6 bf16 passes ≈ 115 us ≈ the 38 MB basis read — they
    overlap), so moving them in-kernel only wins if the pass count
    drops: `precision` selects 'high' (3 passes, ~1e-5 off exact f32 on
    this workload — the 5e-3 parity gate still guards it) or 'highest'
    (6 passes, bit-comparable to the XLA path).  Mosaic lowers only
    DEFAULT/HIGHEST dots, so 'high' is EMULATED: each f32 operand is
    split into a bf16-exact hi part + f32 residual and the product is
    3 single-pass dots (hi@hi + hi@lo + lo@hi — Precision.HIGH's own
    scheme).  Measured on-chip 2026-08-19: 'high' 4835-4848 steps/s vs
    the response-rows path's 4472 (same session); 'highest' had
    measured SLOWER than XLA (236 us vs 164 us: Mosaic's per-program
    skinny matmuls pipeline worse than one big streamed XLA matmul)."""
    shape = (TILE // 128, 128)
    z, _ = _bin_phasor(nfft, shape, off_ref[0, 0])

    # power stack P (order, TILE): log-doubling from the tile phasor
    Pr = jnp.ones(shape, jnp.float32).reshape(1, TILE)
    Pi = jnp.zeros(shape, jnp.float32).reshape(1, TILE)
    zr = z[0].reshape(1, TILE)
    zi = z[1].reshape(1, TILE)
    rows = 1
    while rows < order:
        take = min(rows, order - rows)
        nr = Pr[:take] * zr - Pi[:take] * zi
        ni = Pr[:take] * zi + Pi[:take] * zr
        Pr = jnp.concatenate([Pr, nr], axis=0)
        Pi = jnp.concatenate([Pi, ni], axis=0)
        if 2 * rows < order:
            zr, zi = zr * zr - zi * zi, 2.0 * zr * zi
        rows += take
    P2 = jnp.concatenate([Pr, Pi], axis=1)  # (order, 2*TILE)

    tw = tw_ref[...]  # (order, L*N)
    if precision == "highest":
        def dot(a, b, dims):
            return jax.lax.dot_general(
                a, b, dims, precision=jax.lax.Precision.HIGHEST)
    elif precision == "default":
        # single bf16 pass: ~1e-3 off exact f32 on this workload — only
        # valid behind the caller's final-loss/parity gate
        def dot(a, b, dims):
            return jax.lax.dot_general(
                a, b, dims, precision=jax.lax.Precision.DEFAULT)
    else:
        # Mosaic lowers only DEFAULT/HIGHEST dots, so 'high' (3 bf16
        # passes) is emulated: split each f32 operand into a bf16-exact
        # hi part + f32 residual and issue 3 DEFAULT (single-pass) dots
        # a_hi@b_hi + a_hi@b_lo + a_lo@b_hi — the same scheme
        # Precision.HIGH uses, minus the lo@lo term it also drops.
        def dot(a, b, dims):
            ah = a.astype(jnp.bfloat16).astype(jnp.float32)
            al = a - ah
            bh = b.astype(jnp.bfloat16).astype(jnp.float32)
            bl = b - bh
            d = partial(jax.lax.dot_general, dimension_numbers=dims,
                        precision=jax.lax.Precision.DEFAULT)
            return d(ah, bl) + d(al, bh) + d(ah, bh)
    G2 = dot(tw, P2, (((0,), (0,)), ((), ())))  # (L*N, 2*TILE)
    grm, gim = G2[:, :TILE], G2[:, TILE:]

    H = [[(hr_ref[i * L + j].reshape(shape),
           hi_ref[i * L + j].reshape(shape)) for j in range(L)]
         for i in range(N)]
    G = [[(grm[j * N + k].reshape(shape),
           gim[j * N + k].reshape(shape)) for k in range(N)]
         for j in range(L)]

    A = []
    for i in range(N):
        row = []
        for k in range(N):
            sr = jnp.zeros(shape, hr_ref.dtype)
            si = jnp.zeros(shape, hr_ref.dtype)
            for j in range(L):
                pp = _cmul(H[i][j], G[j][k])
                sr = sr + pp[0]
                si = si + pp[1]
            eye = 1.0 if i == k else 0.0
            row.append((eye - sr, -si))
        A.append(row)
    if pivot:
        A0 = [[A[i][k] for k in range(N)] for i in range(N)]

    rhs = [(rr_ref[i].reshape(shape), ri_ref[i].reshape(shape))
           for i in range(N)]
    if pivot:
        y = _ge_core(A, rhs, N, shape)
    else:
        y = _ge_core_nopivot_factors(A, rhs, N)

    losses = jnp.zeros(shape, hr_ref.dtype)
    w = []
    for i in range(N):
        est = jnp.sqrt(_cabs2(y[i]))
        diff = est - t_ref[i].reshape(shape)
        losses = losses + diff * diff
        g = scale * diff / jnp.where(est > 0.0, est, 1.0)
        w.append((g * y[i][0], -g * y[i][1]))
    loss_ref[0] = losses.reshape(-1)

    if pivot:
        At = [[A0[i][k] for i in range(N)] for k in range(N)]
        xi = _ge_core(At, w, N, shape)
    else:
        xi = _transpose_solve_from_factors(A, w, N)

    sr_rows = []
    si_rows = []
    for j in range(L):
        ar = jnp.zeros(shape, hr_ref.dtype)
        ai = jnp.zeros(shape, hr_ref.dtype)
        for i in range(N):
            pp = _cmul(H[i][j], xi[i])
            ar = ar + pp[0]
            ai = ai + pp[1]
        for k in range(N):
            s = _cmul((ar, ai), y[k])
            sr_rows.append(s[0].reshape(1, TILE))
            si_rows.append(s[1].reshape(1, TILE))
    Sr = jnp.concatenate(sr_rows, axis=0)  # (L*N, TILE)
    Si = jnp.concatenate(si_rows, axis=0)
    # dL/dtw[t, jk] = sum_m Re(s_jk) Pr[t] - Im(s_jk) Pi[t]
    # (dL/dReG = Re S, dL/dImG = -Im S; dG/dtw = P), one merged matmul
    S2 = jnp.concatenate([Sr, -Si], axis=1)  # (L*N, 2*TILE)
    tb = dot(P2, S2, (((1,), (1,)), ((), ())))  # (order, L*N)

    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        tb_ref[0] = tb

    @pl.when(pid > 0)
    def _acc():
        tb_ref[0] = tb_ref[0] + tb


def _aa_taps_tf_mse_ml(N, L, order, nfft, pivot, precision, hr, hi, tw,
                       rr, ri, t, M_true: int, off=None):
    Mp = hr.shape[-1]
    grid = (Mp // TILE,)
    offa, off_spec = _off_operand(off)

    def rows(R):
        return pl.BlockSpec((R, TILE), lambda m: (0, m),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_aa_taps_tf_mse_kernel, N, L, order, nfft,
                2.0 / (M_true * N), pivot, precision),
        grid=grid,
        in_specs=[off_spec, rows(N * L), rows(N * L),
                  pl.BlockSpec((order, L * N), lambda m: (0, 0),
                               memory_space=pltpu.VMEM),
                  rows(N), rows(N), rows(N)],
        out_specs=[rows(1),
                   pl.BlockSpec((1, order, L * N), lambda m: (0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, Mp), hr.dtype),
                   jax.ShapeDtypeStruct((1, order, L * N), hr.dtype)],
        interpret=_interpret(),
    )(offa, hr, hi, tw, rr, ri, t)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _aa_taps_tf_mse(N, L, order, nfft, pivot, precision, hr, hi, tw, rr,
                    ri, t, off):
    return _aa_taps_tf_mse_fwd(N, L, order, nfft, pivot, precision, hr,
                               hi, tw, rr, ri, t, off)[0]


def _aa_taps_tf_mse_fwd(N, L, order, nfft, pivot, precision, hr, hi, tw,
                        rr, ri, t, off):
    M_true = rr.shape[-1]
    Mp = ((M_true + TILE - 1) // TILE) * TILE
    lp, tb = _aa_taps_tf_mse_ml(
        N, L, order, nfft, pivot, precision, _pad_rows(hr, Mp),
        _pad_rows(hi, Mp), tw, _pad_rows(rr, Mp), _pad_rows(ri, Mp),
        _pad_rows(t, Mp), M_true, off=off)
    loss = jnp.sum(lp) / (M_true * N)
    return loss, (tb[0].astype(tw.dtype), hr, rr, t, off)


def _aa_taps_tf_mse_bwd(N, L, order, nfft, pivot, precision, res, g):
    tb, hr, rr, t, off = res
    zh = jnp.zeros_like(hr)
    zr = jnp.zeros_like(rr)
    return (zh, zh, g * tb, zr, zr, jnp.zeros_like(t),
            jnp.zeros_like(off))


_aa_taps_tf_mse.defvjp(_aa_taps_tf_mse_fwd, _aa_taps_tf_mse_bwd)


def pallas_aa_taps_tf_mse(hr, hi, tw, rr, ri, t, N: int, L: int,
                          nfft: int, pivot: bool = False,
                          precision: str = "high", bin_offset=None):
    """Taps-in fused active-acoustics step kernel: same loss as
    :func:`pallas_aa_tf_mse` but differentiable directly in the
    envelope-folded mixer TAPS ``tw`` ((order, L*N) rows ``tw[t, j*N+k]
    = gamma^t taps[t, j, k]``) — the tap->response DFT basis is built
    in-register from the iota phasor by log-doubling and both response
    synthesis and the tap cotangent run as in-kernel MXU matmuls, so
    neither the 38 MB basis nor the 40 MB of response/cotangent rows
    ever touch HBM.  Those contractions are precision-pass-bound:
    ``precision='high'`` (default, 3 bf16 passes emulated via hi/lo
    operand splits — Mosaic lowers only DEFAULT/HIGHEST dots — ~1e-5
    off exact f32 here) halves their cost vs 'highest' (6 passes,
    bit-comparable to the XLA basis-matmul path, which measured FASTER
    than the in-kernel HIGHEST variant — use :func:`pallas_aa_tf_mse`
    if you need it).  On-chip 2026-08-19: 'high' 4835-4848 steps/s vs
    4472 for the response-rows path, the AA bench ladder's lead rung.
    ``precision='default'`` (1 pass) measured +35% on top (6291 vs
    4674 steps/s same-session) but DEGRADES TRAINING: the bf16 tap
    contractions shift the init loss ~5% and the 400-step final loss
    lands 23% higher at reference scale (12.46 -> 15.38,
    deterministic) — explicit opt-in only, never a gated-ladder
    default.  hr/hi/rr/ri/t as in pallas_aa_tf_mse (unpadded
    (rows, M); padding happens here).  ``bin_offset`` shifts the in-register DFT basis'
    bin index (column j -> global bin ``j + bin_offset``) so the kernel
    can run per-shard under a bins ``shard_map``; the loss partial is
    normalized by the LOCAL column count."""
    if precision not in ("default", "high", "highest"):
        raise ValueError(
            "precision must be 'default', 'high' or 'highest'")
    off = (jnp.zeros((), jnp.float32) if bin_offset is None
           else jnp.asarray(bin_offset, jnp.float32))
    return _aa_taps_tf_mse(N, L, tw.shape[0], nfft, pivot, precision,
                           hr, hi, tw, rr, ri, t, off)


def pallas_aa_tf_mse(hr, hi, gr, gi, rr, ri, t, N: int, L: int,
                     pivot: bool = False):
    """Fused active-acoustics training-step kernel: the scalar

        Lss = (1/(M N)) sum_{m,i} (|y_mi| - t_mi)^2,
        y_m = (I_N - H_m G_m)^{-1} r_m

    with its gradient w.r.t. the mixer response rows gr/gi computed in
    the SAME grid pass (assembly of the rectangular product H G, the
    N x N solve, the magnitude-MSE cotangent, and one adjoint solve all
    in vector registers).  The (M, N, N) loop matrix, y, and every
    intermediate cotangent never touch HBM — only the response ROWS
    (channels-major (rows, M) layout, bins on lanes) are streamed, which
    is what makes this fast: the module-graph path's (M, 13, 4)-shaped
    arrays force XLA into (8, 128)-padded tiles that waste ~30x the
    bandwidth (profiled 2026-08-17, 9.7 ms/step of 300-570 us pads/
    copies/fusions).

    hr/hi: (N*L, M) frozen room-response rows, row i*L+j = H[i, j].
    gr/gi: (L*N, M) mixer-response rows, row j*N+k = G[j, k] — the only
    differentiable inputs (cotangent = the in-kernel S-numbers; compose
    with the tap->response matmul outside for tap gradients).
    rr/ri: (N, M) frozen rhs rows (room x input spectrum).
    t: (N, M) target magnitude rows.
    pivot=False reuses the forward no-pivot L/U factors for the adjoint
    (two substitutions); gate on a finite-loss check like the other
    no-pivot users."""
    return _aa_tf_mse(N, L, pivot, hr, hi, gr, gi, rr, ri, t)
