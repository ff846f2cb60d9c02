"""Batched on-device nonsymmetric eigenvalues: Hessenberg + shifted QR.

Nonsymmetric ``eigvals`` has no XLA lowering on TPU, and the axon tunnel
rejects host callbacks outright, so LAPACK is unreachable there
(CLAUDE.md).  The char-poly + Durand-Kerner solver
(:func:`flamo_tpu.functional.eigvals_dk`) covers N <= 8 — the
characteristic-polynomial route loses accuracy quickly above that — which
left the reference's larger analyses (``torch.linalg.eigvals`` for any N,
/root/reference/flamo/functional.py:24-39; GBI of an 8+-mic active-
acoustics rig, /root/reference/examples/e8_active_acoustics.py:183-215)
impossible on the target hardware.

This module implements the LAPACK-family algorithm itself, batched and
jittable with static shapes:

1. **Householder Hessenberg reduction** — N-2 statically-unrolled
   two-sided reflections over the ``(B, N, N)`` batch.
2. **Shifted QR iteration with a fixed deflation schedule, fully
   dynamic control flow** — one ``lax.fori_loop`` over
   ``sweeps * (N-1)`` Wilkinson-shifted QR sweeps; the active block
   size ``m`` shrinks from N to 2 every ``sweeps`` iterations.  Each
   sweep runs the full-width Givens chain (inner ``fori_loop`` with
   ``dynamic_slice`` row/column pair updates) with rotations FORCED to
   identity at positions ``j >= m-1``, which is exactly similarity by
   ``diag(Q_active, I)`` — so the compiled program is O(1) statements
   regardless of N (an earlier statically-unrolled version paid
   O(N^2) trace size: 68 s compile at N=8, unusable at 32).  Batched
   matrices march in lockstep — per-matrix early deflation is replaced
   by the fixed schedule, which costs sweeps but no correctness.
   Eigenvalues are the final diagonal.
3. Every 6th sweep uses an **exceptional shift** (Francis' trick) so
   symmetric stalls — e.g. circulant permutation blocks, where the
   Wilkinson shift sits exactly between two eigenvalues — cannot cycle.

The matrix is spectrum-centered and Frobenius-scaled first (same
conditioning trick as ``eigvals_dk``).  Backward stability of the QR
iteration gives ~``N * eps_f32 * ||A||`` accuracy — measured 1e-6..1e-5
set-match vs LAPACK for random and clustered f32 spectra up to N=32
(tests/test_functional.py) — where the char-poly route is useless.

:func:`eigvals_qr` itself is analysis-only (the Givens iteration is not
usefully differentiable); :func:`eigvals_qr_grad` wraps it with the
closed-form eigenvalue VJP — eigenvectors recovered on device by
inverse iteration — which is what :func:`flamo_tpu.functional.eigvals`
routes every N > 8 training objective through on callback-less
backends (accuracy verified to N = EIG_QR_MAX_N; no hard ceiling —
the dynamic Hessenberg keeps compiled size O(1) in N).  ``lax`` loop carries are re/im REAL pairs (complex carries
hit backend UNIMPLEMENTED on the tunnel, CLAUDE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["eigvals_qr", "eigvals_qr_grad", "EIG_QR_MAX_N"]

#: largest N at which the QR eigensolver's accuracy has been VERIFIED
#: against LAPACK — NOT a hard gate (round 5 removed it): any N
#: compiles in O(1) statements (`_hessenberg_dyn` above
#: `_HESS_STATIC_MAX_N`, dynamic sweeps throughout), matching the
#: reference's any-N `torch.linalg.eigvals` semantics on
#: callback-rejecting backends.  Measured set-match vs LAPACK: 2.5e-5
#: at N=64 and 3.4e-5 at N=128 ON THE TUNNEL (8x128x128 complex64 via
#: the static reduction, compile 51 s, steady-state ~1 ms; 2026-08-19)
#: and to N=192 on CPU through the dynamic reduction (slow tests; the
#: two reductions are pinned to each other at 1e-5 by
#: test_hessenberg_dyn_matches_static).  Above this bound the solver
#: runs but accuracy is extrapolated, and the f32 iteration loses
#: ground on tightly-clustered spectra — validate against your own
#: spectra.  NOTE the grad wrapper's eigenvector recovery materializes
#: a (B, N, N, N) shifted stack (16 MB per batch element at N=128);
#: budget B accordingly.
EIG_QR_MAX_N = 128


def _hessenberg(H):
    """Two-sided Householder reduction to upper Hessenberg form.

    H: (B, N, N) complex.  Statically unrolled over columns (O(N) trace
    size, a handful of einsums per column)."""
    B, N, _ = H.shape
    for k in range(N - 2):
        x = H[:, k + 1:, k]  # (B, n) with n = N-k-1
        normx = jnp.sqrt(jnp.sum(jnp.abs(x) ** 2, axis=-1))
        x0 = x[:, 0]
        ax0 = jnp.abs(x0)
        phase = jnp.where(ax0 > 0.0, x0 / jnp.where(ax0 > 0.0, ax0, 1.0),
                          jnp.ones_like(x0))
        alpha = -phase * normx.astype(x.dtype)
        u = x.at[:, 0].add(-alpha)
        unorm = jnp.sqrt(jnp.sum(jnp.abs(u) ** 2, axis=-1))
        ok = unorm > 0.0
        v = u / jnp.where(ok, unorm, 1.0).astype(u.dtype)[:, None]
        v = jnp.where(ok[:, None], v, jnp.zeros_like(v))
        # rows: H[k+1:, :] -= 2 v (v^H H[k+1:, :])
        w = jnp.einsum("bi,bij->bj", jnp.conj(v), H[:, k + 1:, :])
        H = H.at[:, k + 1:, :].add(-2.0 * v[:, :, None] * w[:, None, :])
        # cols: H[:, k+1:] -= 2 (H[:, k+1:] v) v^H
        w2 = jnp.einsum("bij,bj->bi", H[:, :, k + 1:], v)
        H = H.at[:, :, k + 1:].add(
            -2.0 * w2[:, :, None] * jnp.conj(v)[:, None, :])
    return H


#: static-unroll bound for the Hessenberg reduction: at or below this
#: the shrinking-window unrolled :func:`_hessenberg` wins (fewer flops,
#: O(N) einsums); above it the mask-based :func:`_hessenberg_dyn` keeps
#: COMPILE time O(1) in N — the unroll's compile cost is what used to
#: gate the whole solver.
_HESS_STATIC_MAX_N = 64


def _hessenberg_dyn(H):
    """Mask-based Householder reduction with a dynamic ``fori_loop``
    carry: O(1) compiled statements in N, removing the static unroll's
    compile-time ceiling (51 s at N=128 on the tunnel; minutes beyond).

    Same math as :func:`_hessenberg` — the reflector ``v`` is supported
    on rows > k only, so the full-size rank-1 updates touch exactly the
    rows/columns the shrinking-window version touches (at ~3x the
    flops, irrelevant for an analysis path).  The loop carry is an
    re/im pair: complex ``fori_loop`` carries hit backend UNIMPLEMENTED
    on the axon tunnel (CLAUDE.md)."""
    B, N, _ = H.shape
    idx = jnp.arange(N)

    def body(k, carry):
        Hr, Hi = carry
        Hc = jax.lax.complex(Hr, Hi)
        col = jax.lax.dynamic_slice(Hc, (0, 0, k), (B, N, 1))[..., 0]
        rmask = idx > k  # rows k+1 .. N-1
        x = jnp.where(rmask[None, :], col, jnp.zeros_like(col))
        normx = jnp.sqrt(jnp.sum(jnp.abs(x) ** 2, axis=-1))
        e1 = idx == k + 1
        x0 = jnp.sum(jnp.where(e1[None, :], x, jnp.zeros_like(x)), axis=-1)
        ax0 = jnp.abs(x0)
        phase = jnp.where(ax0 > 0.0, x0 / jnp.where(ax0 > 0.0, ax0, 1.0),
                          jnp.ones_like(x0))
        alpha = -phase * normx.astype(x.dtype)
        u = x - alpha[:, None] * e1[None, :].astype(x.dtype)
        unorm = jnp.sqrt(jnp.sum(jnp.abs(u) ** 2, axis=-1))
        ok = unorm > 0.0
        v = u / jnp.where(ok, unorm, 1.0).astype(u.dtype)[:, None]
        v = jnp.where(ok[:, None], v, jnp.zeros_like(v))
        # rows: H -= 2 v (v^H H) — v is zero on rows <= k
        w = jnp.einsum("bi,bij->bj", jnp.conj(v), Hc)
        Hc = Hc - 2.0 * v[:, :, None] * w[:, None, :]
        # cols: H -= 2 (H v) v^H — v^H is zero on cols <= k
        w2 = jnp.einsum("bij,bj->bi", Hc, v)
        Hc = Hc - 2.0 * w2[:, :, None] * jnp.conj(v)[:, None, :]
        return jnp.real(Hc), jnp.imag(Hc)

    Hr, Hi = jax.lax.fori_loop(0, N - 2, body,
                               (jnp.real(H), jnp.imag(H)))
    return jax.lax.complex(Hr, Hi)


def _wilkinson_shift(blk):
    """Shift from a (B, 2, 2) trailing block: the 2x2 eigenvalue closer
    to the bottom-right entry, via the cancellation-free formula."""
    x = blk[:, 0, 0]
    y = blk[:, 0, 1]
    z = blk[:, 1, 0]
    w = blk[:, 1, 1]
    d = (x - w) * 0.5
    sq = jnp.sqrt(d * d + y * z)
    s1 = d + sq
    s2 = d - sq
    den = jnp.where(jnp.abs(s1) >= jnp.abs(s2), s1, s2)
    ok = jnp.abs(den) > 0.0
    return w - jnp.where(ok, (y * z) / jnp.where(ok, den, 1.0),
                         jnp.zeros_like(w))


def eigvals_qr(A, sweeps: int = 14):
    """Eigenvalues of ``(..., N, N)`` complex/real matrices by batched
    Hessenberg + shifted-QR, fully on device (no host callback, no XLA
    ``eig``).  ``sweeps`` = Wilkinson-shifted QR iterations per deflation
    stage (14 is ample: convergence per eigenvalue is quadratic-to-cubic;
    the fixed schedule replaces per-matrix early deflation so batches
    stay in lockstep).

    Analysis-only (wrapped in stop_gradient by callers); eigenvalue
    order is arbitrary — compare as a set.  Reference semantics:
    ``torch.linalg.eigvals`` (/root/reference/flamo/functional.py:24-39).
    """
    A = jnp.asarray(A)
    if not jnp.issubdtype(A.dtype, jnp.complexfloating):
        A = A.astype(jnp.complex64 if A.dtype != jnp.float64
                     else jnp.complex128)
    batch = A.shape[:-2]
    N = A.shape[-1]
    A = A.reshape((-1, N, N))
    B = A.shape[0]
    if N == 1:
        return A[..., 0, 0].reshape(batch + (1,))

    # spectrum-center + Frobenius scale (eigvals_dk's conditioning trick)
    mu0 = jnp.trace(A, axis1=-2, axis2=-1) / N
    H = A - mu0[:, None, None] * jnp.eye(N, dtype=A.dtype)
    s = jnp.maximum(
        jnp.sqrt(jnp.sum(jnp.abs(H) ** 2, axis=(-2, -1)) / N), 1e-30)
    H = H / s[:, None, None].astype(A.dtype)

    H = (_hessenberg(H) if N <= _HESS_STATIC_MAX_N
         else _hessenberg_dyn(H))
    eyeN = jnp.eye(N, dtype=H.dtype)

    def row_rot(i, carry):
        """Zero the subdiagonal at column j=i: Givens on rows (j, j+1),
        identity when j >= m-1 (outside the active block)."""
        Hr, Hi, car, cai, cbr, cbi, j_active = carry
        j = i
        Hc = jax.lax.complex(Hr, Hi)
        rows = jax.lax.dynamic_slice_in_dim(Hc, j, 2, axis=1)  # (B, 2, N)
        ab = jax.lax.dynamic_slice(rows, (0, 0, j), (B, 2, 1))[..., 0]
        a, b = ab[:, 0], ab[:, 1]
        r = jnp.sqrt(jnp.abs(a) ** 2 + jnp.abs(b) ** 2)
        okr = (r > 0.0) & (j < j_active)
        rinv = (1.0 / jnp.where(r > 0.0, r, 1.0)).astype(Hc.dtype)
        ca = jnp.where(okr, jnp.conj(a) * rinv, jnp.ones_like(a))
        cb = jnp.where(okr, jnp.conj(b) * rinv, jnp.zeros_like(b))
        r0 = ca[:, None] * rows[:, 0] + cb[:, None] * rows[:, 1]
        r1 = (-jnp.conj(cb)[:, None] * rows[:, 0]
              + jnp.conj(ca)[:, None] * rows[:, 1])
        new_rows = jnp.stack([r0, r1], axis=1)
        Hc = jax.lax.dynamic_update_slice_in_dim(Hc, new_rows, j, axis=1)
        car = jax.lax.dynamic_update_index_in_dim(car, jnp.real(ca), j, 0)
        cai = jax.lax.dynamic_update_index_in_dim(cai, jnp.imag(ca), j, 0)
        cbr = jax.lax.dynamic_update_index_in_dim(cbr, jnp.real(cb), j, 0)
        cbi = jax.lax.dynamic_update_index_in_dim(cbi, jnp.imag(cb), j, 0)
        return (jnp.real(Hc), jnp.imag(Hc), car, cai, cbr, cbi, j_active)

    def col_rot(i, carry):
        """RQ phase: right-multiply by G_j^H on columns (j, j+1)."""
        Hr, Hi, car, cai, cbr, cbi = carry
        j = i
        Hc = jax.lax.complex(Hr, Hi)
        ca = jax.lax.complex(car[j], cai[j])
        cb = jax.lax.complex(cbr[j], cbi[j])
        cols = jax.lax.dynamic_slice_in_dim(Hc, j, 2, axis=2)  # (B, N, 2)
        c0 = (cols[:, :, 0] * jnp.conj(ca)[:, None]
              + cols[:, :, 1] * jnp.conj(cb)[:, None])
        c1 = (-cols[:, :, 0] * cb[:, None] + cols[:, :, 1] * ca[:, None])
        new_cols = jnp.stack([c0, c1], axis=2)
        Hc = jax.lax.dynamic_update_slice_in_dim(Hc, new_cols, j, axis=2)
        return (jnp.real(Hc), jnp.imag(Hc), car, cai, cbr, cbi)

    def sweep(i, carry):
        Hr, Hi = carry
        Hc = jax.lax.complex(Hr, Hi)
        m = N - i // sweeps  # active block size, N..2
        blk = jax.lax.dynamic_slice(Hc, (0, m - 2, m - 2), (B, 2, 2))
        mu = _wilkinson_shift(blk)
        # Francis exceptional shift every 6th sweep: breaks the
        # measure-zero cycling cases (e.g. permutation blocks) where the
        # Wilkinson shift is equidistant from two eigenvalues
        exc = blk[:, 1, 1] + 0.75 * jnp.abs(blk[:, 1, 0]).astype(Hc.dtype)
        mu = jnp.where(i % 6 == 5, exc, mu)
        # full-diagonal shift is exact: rotations never touch the
        # deflated block (identity for j >= m-1), so +mu below restores
        # its diagonal bit-for-bit
        Hc = Hc - mu[:, None, None] * eyeN
        zc = jnp.zeros((N - 1, B), jnp.real(Hc).dtype)
        Hr2, Hi2, car, cai, cbr, cbi, _ = jax.lax.fori_loop(
            0, N - 1, row_rot,
            (jnp.real(Hc), jnp.imag(Hc), zc, zc, zc, zc, m - 1))
        Hr2, Hi2, *_ = jax.lax.fori_loop(
            0, N - 1, col_rot, (Hr2, Hi2, car, cai, cbr, cbi))
        Hc = jax.lax.complex(Hr2, Hi2) + mu[:, None, None] * eyeN
        return jnp.real(Hc), jnp.imag(Hc)

    Hr, Hi = jax.lax.fori_loop(0, sweeps * (N - 1), sweep,
                               (jnp.real(H), jnp.imag(H)))
    H = jax.lax.complex(Hr, Hi)
    z = jnp.diagonal(H, axis1=-2, axis2=-1)
    out = z * s[:, None].astype(z.dtype) + mu0[:, None]
    return out.reshape(batch + (N,))


# ----------------------------------------------------------------------
# differentiable wrapper: closed-form eigenvalue VJP with on-device
# inverse-iteration eigenvectors
# ----------------------------------------------------------------------
def _right_eigvecs(A, lam, iters: int = 2):
    """Right eigenvectors of ``A`` (B, N, N) by inverse iteration seeded
    with the computed eigenvalues ``lam`` (B, N).

    The shift is perturbed by ``~1e-6 * ||A||_F / sqrt(N)`` — the f32 QR
    eigenvalues are only that accurate anyway, and it keeps the pivoted
    elimination away from exact zero pivots (LAPACK's xHSEIN plays the
    same trick).  Two normalized iterations from a fixed golden-angle
    start vector (no alignment with structured eigenbases such as
    Hadamard/circulant); each iteration multiplies the error by
    ``~(perturbation / spectral gap)``, so simple well-separated spectra
    get eigenvectors to ~f32 accuracy.  Returns V with columns
    ``V[..., :, k] = v_k``.

    Memory: the shifted-matrix stack is O(B * N^3) complex operands
    (every eigenvalue gets its own (N, N) system) — at N = 64 with a
    1600-bin batch that is ~6.7 GB, so large-N batches should be
    chunked by the caller.  N <= 32 uses the statically-unrolled
    pivoted :func:`gauss_solve` (fastest on TPU); larger N routes
    through :func:`gauss_solve_loop` (O(1) compiled statements — the
    unrolled elimination's O(N^2) HLO is compile-hostile past N = 32,
    CLAUDE.md).
    """
    from flamo_tpu.ops.solve import gauss_solve, gauss_solve_loop

    B, N, _ = A.shape
    eye = jnp.eye(N, dtype=A.dtype)
    s = jnp.maximum(
        jnp.sqrt(jnp.sum(jnp.abs(A) ** 2, axis=(-2, -1)) / N), 1e-30)
    shift = lam + (1e-6 * s[:, None]).astype(lam.dtype)
    Ms = A[:, None, :, :] - shift[:, :, None, None] * eye  # (B, N, N, N)
    ang = 2.399963 * jnp.arange(N, dtype=jnp.float32)  # golden angle
    b0 = (jnp.cos(ang) + 1j * jnp.sin(0.5 * ang + 0.25)).astype(A.dtype)
    b0 = b0 / jnp.linalg.norm(b0).astype(A.dtype)
    x = jnp.broadcast_to(b0, (B, N, N))
    solve = gauss_solve if N <= 32 else gauss_solve_loop
    for _ in range(iters):
        x = solve(Ms, x)  # vector rhs per (B, N) shift
        nrm = jnp.sqrt(jnp.sum(jnp.abs(x) ** 2, axis=-1, keepdims=True))
        x = x / jnp.maximum(nrm, 1e-30).astype(x.dtype)
    return jnp.swapaxes(x, -1, -2)


def eigvals_qr_grad(A, sweeps: int = 14, iters: int = 2):
    """Differentiable :func:`eigvals_qr`: eigenvalues by the on-device
    QR iteration, gradients by the closed-form eigenvector pullback.

    The QR iteration itself is not usefully differentiable (Givens
    chains through ``fori_loop`` carries), but the eigenvalue
    derivative has a closed form: with ``A = V diag(w) V^-1`` and
    simple eigenvalues, ``dw_i = (V^-1 dA V)_ii``, hence ``A_bar =
    (V diag(w_bar) V^-1)^T`` — the same pullback
    :func:`flamo_tpu.functional.eigvals_lapack` uses, with ``V``
    recovered ON DEVICE by inverse iteration seeded with the converged
    eigenvalues (:func:`_right_eigvecs`) instead of shipped from a host
    callback.  This lifts the trainable-eigenvalue ceiling on
    callback-less backends (axon) from the char-poly solver's N <= 8 to
    any N (accuracy verified to N = EIG_QR_MAX_N): ``mse_evs``
    objectives over 8+-mic active-acoustics rigs
    (reference e8_active_acoustics.py:564-621 via torch.linalg.eigvals
    autograd) become trainable on the target hardware.

    Gradients are exact for simple spectra; near-defective matrices
    inflate ``V^-1`` (same failure mode as the LAPACK route).  Order is
    arbitrary — consume as a set (sort / symmetric functions), as every
    in-tree objective does.
    """
    return _eigvals_qr_grad(A, sweeps, iters)


from functools import partial as _partial  # noqa: E402


@_partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _eigvals_qr_grad(A, sweeps, iters):
    return eigvals_qr(A, sweeps)


def _eigvals_qr_grad_fwd(A, sweeps, iters):
    A = jnp.asarray(A)
    Ac = A if jnp.issubdtype(A.dtype, jnp.complexfloating) else A.astype(
        jnp.complex64 if A.dtype != jnp.float64 else jnp.complex128)
    N = A.shape[-1]
    Acf = Ac.reshape((-1, N, N))
    lam = eigvals_qr(Acf, sweeps)
    return lam.reshape(A.shape[:-1]), (Acf, lam,
                                       jnp.zeros((0,), A.dtype))


def _eigvals_qr_grad_bwd(sweeps, iters, res, w_bar):
    from flamo_tpu.ops.solve import gauss_solve, gauss_solve_loop

    Acf, lam, sentinel = res
    in_dtype = sentinel.dtype
    batch = w_bar.shape[:-1]
    N = w_bar.shape[-1]
    wb = w_bar.reshape((-1, N)).astype(Acf.dtype)
    V = _right_eigvecs(Acf, lam, iters)
    eyeb = jnp.broadcast_to(jnp.eye(N, dtype=V.dtype), V.shape)
    # same compile-cost routing as _right_eigvecs: the statically
    # unrolled elimination's O(N^2) HLO is compile-hostile past N = 32
    Vinv = (gauss_solve if N <= 32 else gauss_solve_loop)(V, eyeb)
    # JAX cotangents carry the conjugation, so the pullback is the plain
    # transpose — identical convention to functional._eigvals_bwd.
    A_bar = jnp.swapaxes(V @ (wb[:, :, None] * Vinv), -1, -2)
    if not jnp.issubdtype(in_dtype, jnp.complexfloating):
        A_bar = A_bar.real
    return (A_bar.astype(in_dtype).reshape(batch + (N, N)),)


_eigvals_qr_grad.defvjp(_eigvals_qr_grad_fwd, _eigvals_qr_grad_bwd)
