"""Math kernels (counterpart of reference flamo/functional.py, 1074 LoC).

All functions are pure, jittable jnp code.  Differences from the reference
that are deliberate TPU-first design:

* :func:`expm` — ``jax.scipy.linalg.expm`` is unimplemented on this TPU
  backend, so orthogonal maps use a custom scaling-and-squaring matrix
  exponential built from matmuls only (MXU-friendly, differentiable).
* :func:`get_eigenvalues` / :func:`eigvals` — nonsymmetric eigvals are
  not TPU-supported in XLA; where host callbacks work they route through
  ``jax.pure_callback`` to CPU LAPACK, and on backends that reject
  callbacks (the axon TPU plugin) small-N matrices use the fully
  on-device char-poly solver :func:`eigvals_dk` (Faddeev–LeVerrier +
  Durand–Kerner with an implicit-function VJP).
* low-order polynomial responses are evaluated directly at
  ``z = e^{-j omega}`` instead of zero-padded rffts (identical values,
  O(M) elementwise work that XLA fuses on the VPU).
"""

from __future__ import annotations

import math

import functools

import jax
import jax.numpy as jnp
import numpy as np

from flamo_tpu.core import complex_dtype_for
from flamo_tpu.utils import RegularGridInterpolator, next_key, to_complex

__all__ = [
    "get_magnitude", "get_eigenvalues", "eigvals", "eigvals_dk",
    "eigvals_lapack", "eigvals_qr", "eigvals_qr_grad",
    "charpoly", "poly_roots", "poly_roots_rows", "spectral_radius",
    "skew_matrix",
    "expm", "expm_skew",
    "get_frequency_samples", "hadamard_matrix_jnp", "HadamardMatrix",
    "RotationMatrix", "rotation_matrix", "biquad2tf", "signal_gallery",
    "gen_velvet_noise", "hertz2rad", "rad2hertz", "db2mag", "mag2db",
    "lowpass_filter", "highpass_filter", "bandpass_filter",
    "shelving_filter", "peak_filter", "prop_shelving_filter",
    "prop_peak_filter", "sosfreqz", "svf", "probe_sos", "find_onset",
    "WGN_reverb", "rfft_phasor", "poly_response", "to_complex",
]


# ----------------------------------------------------------------------
# basic linear algebra
# ----------------------------------------------------------------------
def get_magnitude(x):
    """|x| (reference functional.py:10-21)."""
    return jnp.abs(x)


def _np_eigvals(x):
    return np.linalg.eigvals(np.asarray(x)).astype(
        complex_dtype_for(jnp.asarray(x).real.dtype)
    )


#: largest N routed to the on-device char-poly eigensolver where host
#: callbacks are unavailable (accuracy verified to ~5e-7 rel at N <= 8
#: for well-separated spectra; the char-poly route degrades with N)
EIG_DK_MAX_N = 8

# the on-device Hessenberg+QR eigensolver handles ANY N above that
# (O(1) compiled statements; EIG_QR_MAX_N is the verified-accuracy
# bound, not a gate) — full torch.linalg.eigvals parity for GBI-style
# analysis AND mse_evs training on the callback-less axon backend
from flamo_tpu.ops.qr_eig import (  # noqa: E402
    EIG_QR_MAX_N, eigvals_qr, eigvals_qr_grad)


def _callbacks_unsupported() -> bool:
    """The axon tunnel's PJRT plugin rejects host callbacks outright
    ("axon_pjrt does not support host send/recv callbacks", verified
    2026-08-17) — LAPACK eig is unreachable there.  The plugin reports
    platform 'tpu'; 'axon' only shows in client.platform_version."""
    if jax.default_backend() == "cpu":
        return False
    if jax.default_backend() == "axon":
        return True
    try:
        pv = jax.devices()[0].client.platform_version
    except Exception:  # pragma: no cover - exotic backends
        return False
    return "axon" in pv.lower()


def get_eigenvalues(x):
    """Eigenvalues of (..., N, N) (reference functional.py:24-39).

    Nonsymmetric eig is not available in XLA on TPU; this routes through a
    host callback (analysis-only, not differentiable) — SURVEY.md §7 hard
    part #2.  On backends that reject host callbacks (axon): N <= 8 uses
    the on-device char-poly solver :func:`eigvals_dk` (shared with the
    trainable objectives), any larger N the on-device
    Hessenberg+shifted-QR solver
    :func:`flamo_tpu.ops.qr_eig.eigvals_qr` (~1e-5..3.4e-5 set-match
    vs LAPACK, verified on the tunnel to N = EIG_QR_MAX_N = 128; O(1)
    compiled statements at any N) — so GBI-style analyses of larger
    rigs (reference e8_active_acoustics.py:183-215) run on that
    hardware too.
    """
    x = jnp.asarray(x)
    assert x.shape[-1] == x.shape[-2]
    if x.shape[-1] == 1:
        return x
    if _callbacks_unsupported():
        if x.shape[-1] <= EIG_DK_MAX_N:
            return jax.lax.stop_gradient(eigvals_dk(x))
        # any N: dynamic Hessenberg + shifted QR, O(1) compiled
        # statements — accuracy VERIFIED to EIG_QR_MAX_N (see qr_eig)
        from flamo_tpu.ops.qr_eig import eigvals_qr

        return jax.lax.stop_gradient(eigvals_qr(x))
    out_dtype = complex_dtype_for(x.real.dtype)
    result_shape = jax.ShapeDtypeStruct(x.shape[:-1], out_dtype)
    return jax.pure_callback(_np_eigvals, result_shape, x, vmap_method="expand_dims")


def _eig_pair_host(x):
    a = np.asarray(x)
    cd = complex_dtype_for(jnp.asarray(x).real.dtype)
    w, v = np.linalg.eig(a)
    vinv = np.linalg.inv(v)
    return w.astype(cd), v.astype(cd), vinv.astype(cd)


def _eig_pair(A):
    A = jnp.asarray(A)
    cd = complex_dtype_for(A.real.dtype)
    rs = (jax.ShapeDtypeStruct(A.shape[:-1], cd),
          jax.ShapeDtypeStruct(A.shape, cd),
          jax.ShapeDtypeStruct(A.shape, cd))
    return jax.pure_callback(_eig_pair_host, rs, A,
                             vmap_method="expand_dims")


@jax.custom_vjp
def eigvals_lapack(A):
    """Differentiable eigenvalues of ``(..., N, N)`` matrices.

    Nonsymmetric eig has no XLA lowering on TPU and no JAX autodiff rule
    anywhere, so the reference's trainable eigenvalue objectives
    (``MSE_evs``, /root/reference/examples/e8_active_acoustics.py:564-621,
    backed by torch.linalg.eigvals autograd) had no counterpart.  This
    routes the decomposition through a host callback (LAPACK ``eig``) and
    supplies the closed-form VJP: with ``A = V diag(w) V^-1`` and distinct
    eigenvalues, ``dw_i = (V^-1 dA V)_ii``, hence ``A_bar =
    V^-H diag(w_bar) V^H`` — two small batched matmuls on device.

    Gradients are exact for simple (non-defective) spectra, which holds
    almost surely for the random loop matrices this trains.  Use
    :func:`get_eigenvalues` for cheap no-grad analysis.
    """
    return _eig_pair(A)[0]


def _eigvals_fwd(A):
    A = jnp.asarray(A)
    w, v, vinv = _eig_pair(A)
    return w, (v, vinv, jnp.zeros((0,), A.dtype))


def _eigvals_bwd(res, w_bar):
    v, vinv, dtype_sentinel = res
    in_dtype = dtype_sentinel.dtype
    # JAX cotangents carry the conjugation ("grad = conj Wirtinger"), so the
    # pullback is the plain transpose (V diag(w_bar) V^-1)^T, not the
    # conjugate transpose (verified against LAPACK finite differences and
    # torch.linalg.eigvals autograd in tests/test_parity.py).
    A_bar = jnp.swapaxes(v @ (w_bar[..., :, None] * vinv), -1, -2)
    if not jnp.issubdtype(in_dtype, jnp.complexfloating):
        A_bar = A_bar.real  # project onto the real tangent space
    return (A_bar.astype(in_dtype),)


eigvals_lapack.defvjp(_eigvals_fwd, _eigvals_bwd)


def eigvals(A):
    """Differentiable eigenvalues of ``(..., N, N)`` matrices.

    Dispatches per backend (trace-time static check): LAPACK through a
    host callback with the closed-form eigvector VJP
    (:func:`eigvals_lapack`) where callbacks work; on backends that
    reject host callbacks (the axon TPU tunnel) the fully on-device
    char-poly solver (:func:`eigvals_dk`) for N <= EIG_DK_MAX_N and the
    on-device QR solver with the inverse-iteration eigenvector pullback
    (:func:`flamo_tpu.ops.qr_eig.eigvals_qr_grad`) for any larger N
    (accuracy verified to N = EIG_QR_MAX_N; the VJP materializes an
    O(B N^3) eigenvector-recovery stack — budget the batch at large N).
    All are exact-gradient for simple spectra;
    eigenvalue ORDER is backend-dependent (LAPACK vs iteration order) —
    treat the result as a set (sort, or use symmetric functions), which
    is what every in-tree consumer (optimize.mse_evs, GBI analysis)
    does.
    """
    A = jnp.asarray(A)
    if _callbacks_unsupported():
        if A.shape[-1] <= EIG_DK_MAX_N:
            return eigvals_dk(A)
        # any N (accuracy VERIFIED to EIG_QR_MAX_N; the VJP's
        # eigenvector recovery is O(B * N^3) memory — see qr_eig)
        from flamo_tpu.ops.qr_eig import eigvals_qr_grad

        return eigvals_qr_grad(A)
    return eigvals_lapack(A)


def spectral_radius(A, iters: int = 64, tail: int = 8):
    """Differentiable spectral-radius estimate of ``(..., N, N)`` matrices.

    TPU-native alternative to :func:`get_eigenvalues` for stability
    analysis (reference e8_active_acoustics.py:183-215 uses
    ``torch.linalg.eigvals`` eagerly): power iteration built from batched
    matvecs, so it runs inside ``jit``/``grad``/``vmap`` on device where
    nonsymmetric eig is unavailable.  Returns ``rho(A) = max |lambda|``.

    The per-step norm ratio oscillates when the dominant eigenvalues are a
    complex-conjugate pair of equal modulus (the common case for real
    feedback matrices); the geometric mean of the last ``tail`` ratios
    averages that oscillation out.  Accuracy after ``iters`` steps is
    ``O((|lambda_2|/|lambda_1|)^iters)`` plus the tail-averaging residual —
    a few 1e-3 relative in typical use, which is ample for gain-before-
    instability headroom estimates (the quantity is a log anyway).
    """
    A = jnp.asarray(A)
    n = A.shape[-1]
    cd = complex_dtype_for(A.real.dtype)
    A = A.astype(cd)
    # Deterministic complex start vector: generic direction (nonzero
    # projection on every eigenvector for all but measure-zero A), complex so
    # conjugate-pair subspaces are excited asymmetrically.
    k = jnp.arange(1, n + 1, dtype=A.real.dtype)
    v0 = (k + 1j * jnp.sqrt(k)).astype(cd)
    v0 = jnp.broadcast_to(v0, A.shape[:-1])
    v0 = v0 / jnp.linalg.norm(v0, axis=-1, keepdims=True)

    def step(v, _):
        w = jnp.einsum("...ij,...j->...i", A, v)
        r = jnp.linalg.norm(w, axis=-1)
        return w / (r[..., None] + 1e-30), r

    _, ratios = jax.lax.scan(step, v0, None, length=iters)
    tail = min(tail, iters)
    return jnp.exp(jnp.mean(jnp.log(ratios[-tail:] + 1e-30), axis=0))


def charpoly(A):
    """Characteristic-polynomial coefficients of ``(..., N, N)`` matrices
    by the Faddeev–LeVerrier recursion (N batched matmuls + traces —
    MXU-friendly, differentiable, jittable).

    Returns ``c`` of shape ``(..., N)`` such that
    ``p(z) = z^N + c[0] z^{N-1} + ... + c[N-1]``  (monic, leading 1
    implicit)."""
    A = jnp.asarray(A)
    N = A.shape[-1]
    eye = jnp.eye(N, dtype=A.dtype)
    Mk = A
    cs = []
    c = -jnp.trace(Mk, axis1=-2, axis2=-1)
    cs.append(c)
    for k in range(2, N + 1):
        # HIGHEST precision: the TPU's default bf16 matmul passes put
        # ~1e-3 on the coefficients (and hence the roots — measured
        # on-chip 2026-08-17: median root err 1.45e-3 with perfectly
        # converged residuals); the matrices are tiny, so exact f32 is
        # free
        Mk = jnp.matmul(A, Mk + c[..., None, None] * eye,
                        precision=jax.lax.Precision.HIGHEST)
        c = -jnp.trace(Mk, axis1=-2, axis2=-1) / k
        cs.append(c)
    return jnp.stack(cs, axis=-1)


def _dk_iterate(c, iters: int):
    """Durand–Kerner (Weierstrass) simultaneous root iteration for monic
    polynomials with coefficient rows ``c`` (..., N)."""
    N = c.shape[-1]
    cd = c.dtype
    # start on a circle at the Cauchy-ish radius with an irrational angle
    # offset (breaks symmetric stalls); generic for all but measure-zero c
    R = 1.0 + jnp.max(jnp.abs(c), axis=-1)
    ang = 2.0 * jnp.pi * (jnp.arange(N) + 0.354) / N
    z = (0.9 * R[..., None]).astype(cd) * jnp.exp(
        1j * ang.astype(c.real.dtype)).astype(cd)

    def p_of(z):
        # monic Horner over the trailing coefficient axis, broadcast
        # over the N root slots
        acc = jnp.ones(z.shape, cd)
        for k in range(N):
            acc = acc * z + c[..., None, k]
        return acc

    # the scan carry is a re/im REAL pair: complex leaves carried
    # through lax.scan hit backend UNIMPLEMENTED on the axon tunnel
    # (same dodge as dsp.CachedResponse)
    def body(carry, _):
        z = jax.lax.complex(carry[0], carry[1])
        pz = p_of(z)
        diff = z[..., :, None] - z[..., None, :]
        diff = diff + jnp.eye(N, dtype=cd)  # self-term -> 1
        denom = jnp.prod(diff, axis=-1)
        ok = jnp.abs(denom) > 0.0
        step = pz / jnp.where(ok, denom, 1.0)
        z = z - jnp.where(ok, step, 0.0)
        return (jnp.real(z), jnp.imag(z)), None

    (zr, zi), _ = jax.lax.scan(body, (jnp.real(z), jnp.imag(z)), None,
                               length=iters)
    return jax.lax.complex(zr, zi)


def _dk_roots(c, iters: int):
    """Dispatch the Durand–Kerner iteration: the in-register Pallas
    kernel on accelerator backends (the XLA scan path launches hundreds
    of ~1-2 us elementwise kernels per call — the dominant cost of
    eigenvalue-objective training steps), the lax.scan path on CPU
    (where the Pallas interpreter would be slower) and for x64 inputs
    (the kernel is f32).  ``FLAMO_TPU_DK_XLA=1`` forces the scan path
    everywhere (escape hatch for tunnel Mosaic regressions).  Both paths
    run the identical Jacobi update from the identical init circle."""
    import os

    c = jnp.asarray(c)
    dd = jax.config.jax_default_device  # host_eager() pins this to CPU
    on_cpu = (jax.default_backend() == "cpu"
              or (dd is not None and dd.platform == "cpu"))
    if (not on_cpu and c.dtype == jnp.complex64
            and not os.environ.get("FLAMO_TPU_DK_XLA")):
        from flamo_tpu.ops.pallas_eig import pallas_dk_roots

        return pallas_dk_roots(c, iters=iters)
    return _dk_iterate(c, iters)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def poly_roots(c, iters: int = 96):
    """All complex roots of the monic polynomial(s)
    ``z^N + c[..., 0] z^{N-1} + ... + c[..., N-1]`` by batched
    Durand–Kerner iteration — elementwise complex arithmetic only, so it
    runs inside jit/vmap/grad on TPU where LAPACK is unreachable.

    The VJP is the implicit-function-theorem pullback at the converged
    roots: ``dz_i/dc_k = -z_i^{N-1-k} / prod_{j != i} (z_i - z_j)``
    (exact for simple roots; repeated roots have unbounded sensitivity —
    same contract as :func:`eigvals`).  Root order is arbitrary
    (iteration order, NOT LAPACK order)."""
    return _dk_roots(c, iters)


def _poly_roots_fwd(c, iters: int = 96):
    z = _dk_roots(jnp.asarray(c), iters)
    return z, (z, jnp.asarray(c))


def _poly_roots_bwd(iters, res, z_bar):
    z, c = res
    N = c.shape[-1]
    cd = c.dtype
    diff = z[..., :, None] - z[..., None, :]
    diff = diff + jnp.eye(N, dtype=cd)
    dp = jnp.prod(diff, axis=-1)  # p'(z_i) for monic p, from the roots
    ok = jnp.abs(dp) > 0.0
    w = z_bar / jnp.where(ok, dp, 1.0)
    w = jnp.where(ok, w, 0.0)
    # powers z_i^{N-1-k}, k = 0..N-1
    pw = jnp.stack([z ** (N - 1 - k) for k in range(N)], axis=-1)
    # JAX cotangents transform by the unconjugated transpose
    c_bar = -jnp.sum(w[..., :, None] * pw, axis=-2)
    return (c_bar.astype(cd),)


poly_roots.defvjp(_poly_roots_fwd, _poly_roots_bwd)


def _dk_roots_rows(cr, ci, iters: int):
    """Rows-layout dispatch twin of :func:`_dk_roots`: real coefficient
    rows (N, B) -> real root rows (zr, zi)."""
    import os

    dd = jax.config.jax_default_device
    on_cpu = (jax.default_backend() == "cpu"
              or (dd is not None and dd.platform == "cpu"))
    if not on_cpu and not os.environ.get("FLAMO_TPU_DK_XLA"):
        from flamo_tpu.ops.pallas_eig import pallas_dk_roots_rows

        return pallas_dk_roots_rows(cr, ci, iters=iters)
    z = _dk_iterate(jax.lax.complex(cr, ci).T, iters).T
    return jnp.real(z), jnp.imag(z)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def poly_roots_rows(cr, ci, iters: int = 96):
    """Lanes-major twin of :func:`poly_roots` for TPU hot paths: real
    coefficient ROWS ``cr``/``ci`` of shape ``(N, B)`` (polynomials on
    the LAST axis, which maps to vector lanes) -> real root rows
    ``(zr, zi)``, each ``(N, B)``.

    Keeping the batch axis last avoids the (8, 128)-padded-tile
    bandwidth waste that (B, N)-major layouts pay for small N on TPU,
    and lets callers stay in explicit re/im arithmetic end to end (no
    complex carries — a tunnel minefield, CLAUDE.md).  Same iteration,
    same root ordering, and the same implicit-function pullback as
    :func:`poly_roots`, just expressed on rows."""
    return _dk_roots_rows(cr, ci, iters)


def _poly_roots_rows_fwd(cr, ci, iters: int = 96):
    zr, zi = _dk_roots_rows(cr, ci, iters)
    return (zr, zi), (zr, zi)


def _poly_roots_rows_bwd(iters, res, zbar):
    """Implicit-function pullback on rows.  With holomorphic roots
    z(c), J_nk = dz_n/dc_k = -z_n^{N-1-k} / p'(z_n): for the real-pair
    map (cr, ci) -> (zr, zi) the chain gives
    ``cr_bar = Re(acc)``, ``ci_bar = -Im(acc)`` with
    ``acc_k = sum_n conj(zbar_n) J_nk`` (verified against autodiff
    through the complex :func:`poly_roots` in tests/test_functional)."""
    zr, zi = res
    zr_bar, zi_bar = zbar
    N = zr.shape[0]
    z = jax.lax.complex(zr, zi)  # (N, B)
    diff = z[:, None, :] - z[None, :, :]
    diff = diff + jnp.eye(N, dtype=z.dtype)[..., None]
    dp = jnp.prod(diff, axis=1)  # p'(z_n) rows, (N, B)
    ok = jnp.abs(dp) > 0.0
    w = jax.lax.complex(zr_bar, -zi_bar) / jnp.where(ok, dp, 1.0)
    w = jnp.where(ok, w, 0.0)
    # acc_k = -sum_n w_n z_n^{N-1-k}, built highest-power-first
    crb = []
    cib = []
    p = jnp.ones_like(z)
    for _ in range(N):
        acc = -jnp.sum(w * p, axis=0)
        crb.append(jnp.real(acc))
        cib.append(-jnp.imag(acc))
        p = p * z
    return jnp.stack(crb[::-1]), jnp.stack(cib[::-1])


poly_roots_rows.defvjp(_poly_roots_rows_fwd, _poly_roots_rows_bwd)


def eigvals_dk(A, iters: int = 96):
    """Fully on-device differentiable eigenvalues of small ``(..., N, N)``
    matrices: :func:`charpoly` (Faddeev–LeVerrier) + :func:`poly_roots`
    (Durand–Kerner), composed under jit/vmap/grad with no host callback —
    the axon TPU backend rejects host callbacks outright
    (``axon_pjrt does not support host send/recv callbacks``), so this is
    the only way to TRAIN eigenvalue objectives (optimize.mse_evs,
    reference e8_active_acoustics.py:564-621) on that hardware.

    The matrix is spectrum-centered and scaled before the coefficient
    recursion (``B = (A - mu I)/s``) to tame the characteristic
    polynomial's conditioning; accuracy is the char-poly root floor:
    ~1e-5 rel for well-separated f32 spectra at N <= 8, degrading for
    clustered roots (use :func:`eigvals` / LAPACK where callbacks work
    and bitwise parity matters).  Root order is arbitrary — compare
    sorted or through symmetric functions."""
    A = jnp.asarray(A)
    cd = complex_dtype_for(A.real.dtype)
    A = A.astype(cd)
    N = A.shape[-1]
    mu = jnp.trace(A, axis1=-2, axis2=-1) / N
    B = A - mu[..., None, None] * jnp.eye(N, dtype=cd)
    s = jnp.maximum(jnp.sqrt(jnp.sum(jnp.abs(B) ** 2, axis=(-2, -1)) / N),
                    1e-30)
    B = B / s[..., None, None]
    z = poly_roots(charpoly(B), iters)
    return z * s[..., None].astype(cd) + mu[..., None]


def skew_matrix(X):
    """Upper-triangular antisymmetrization (reference functional.py:42-56)."""
    A = jnp.triu(X, 1)
    return A - jnp.swapaxes(A, -1, -2)


def expm(A, order: int = 10):
    """Matrix exponential via scaling-and-squaring + Taylor series.

    Pure matmuls -> runs on the MXU and differentiates cleanly.  Accuracy for
    the small (N<=64) matrices used here is ~float32 eps.  Squaring count is
    static (based on a conservative bound) so the jitted graph has no
    data-dependent control flow, and order+s are kept minimal (15 matmuls)
    because the sequential chain bounds step latency.
    """
    A = jnp.asarray(A)
    n = A.shape[-1]
    # s=5 scales ||A|| <= 16 down to <= 0.5; the N(0,1) skew matrices used
    # here have ||A||_2 ~ 2 sqrt(n), so this covers N <= 64.  Taylor-10 at
    # norm 0.5 has truncation error ~5e-11; rounding through 5 squarings
    # stays ~32 eps.
    s = 5
    As = A / (2.0 ** s)
    # Taylor series of exp(As)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    term = eye
    out = eye
    for k in range(1, order + 1):
        term = jnp.matmul(term, As) / k
        out = out + term
    for _ in range(s):
        out = jnp.matmul(out, out)
    return out


def expm_skew(X):
    """Orthogonal matrix exp(skew(X)) — the reference's ``orthogonal`` map
    (dsp.py:649, functional.py:42-56)."""
    return expm(skew_matrix(X))


def get_frequency_samples(num: int, dtype=jnp.float32):
    """Unit-circle samples e^{j pi t}, t in [0,1] (reference functional.py:59-73)."""
    angle = jnp.linspace(0.0, 1.0, num, dtype=dtype)
    return jnp.exp(1j * angle * jnp.pi).astype(complex_dtype_for(dtype))


def hadamard_matrix_jnp(N: int, dtype=jnp.float32):
    """Normalized Hadamard matrix via Kronecker doubling
    (reference functional.py:76-93, scattering.py:243-253)."""
    U = np.array([[1.0]])
    while U.shape[0] < N:
        U = np.kron(U, np.array([[1.0, 1.0], [1.0, -1.0]])) / np.sqrt(2.0)
    return jnp.asarray(U, dtype=dtype)


class HadamardMatrix:
    """Callable map ignoring its input, returning the Hadamard matrix
    (mirrors the reference nn.Module map, functional.py:76-93)."""

    def __init__(self, N: int, dtype=jnp.float32):
        self.N = N
        self.dtype = dtype

    def __call__(self, x):
        return hadamard_matrix_jnp(self.N, self.dtype)

    def __hash__(self):
        return hash(("HadamardMatrix", self.N, str(self.dtype)))

    def __eq__(self, other):
        return (
            isinstance(other, HadamardMatrix)
            and other.N == self.N
            and str(other.dtype) == str(self.dtype)
        )


def rotation_matrix(theta, N: int, iters=None, min_angle=0.0,
                    max_angle=math.pi / 4, dtype=jnp.float32):
    """Kronecker-of-2x2-rotations orthogonal matrix
    (reference functional.py:96-138)."""
    theta = jnp.clip(jnp.asarray(theta, dtype=dtype), min_angle, max_angle)
    c, s = jnp.cos(theta), jnp.sin(theta)
    X = jnp.stack([jnp.stack([c, s]), jnp.stack([-s, c])])
    if iters is None:
        iters = int(math.log2(N)) - 1
    for _ in range(int(iters)):
        X = jnp.kron(X, X)
    return X


class RotationMatrix:
    """Callable map: scalar raw angle -> Kronecker rotation matrix."""

    def __init__(self, N: int, iters=None, min_angle=0.0,
                 max_angle=math.pi / 4, dtype=jnp.float32):
        self.N, self.iters = N, iters
        self.min_angle, self.max_angle = min_angle, max_angle
        self.dtype = dtype

    def __call__(self, theta):
        return rotation_matrix(theta, self.N, self.iters, self.min_angle,
                               self.max_angle, self.dtype)

    def __hash__(self):
        return hash(("RotationMatrix", self.N, self.iters, str(self.dtype)))

    def __eq__(self, other):
        return (
            isinstance(other, RotationMatrix)
            and (other.N, other.iters) == (self.N, self.iters)
            and str(other.dtype) == str(self.dtype)
        )


# ----------------------------------------------------------------------
# polynomial / transfer-function evaluation
# ----------------------------------------------------------------------
def rfft_phasor(nfft: int, dtype=jnp.float32):
    """z^{-1} on the rfft grid: e^{-j 2 pi m / nfft}, shape (nfft//2+1,)."""
    m = jnp.arange(nfft // 2 + 1, dtype=dtype)
    w = 2.0 * jnp.pi * m / nfft
    return jnp.exp(-1j * w).astype(complex_dtype_for(dtype))


def poly_response(coeffs, nfft: int):
    """Exact equivalent of ``rfft(pad(coeffs, nfft), axis=0)`` for low-order
    polynomials, evaluated by Horner on the rfft grid.

    coeffs: (P, ...) tap axis first.  Returns (M, ...) complex with
    M = nfft//2+1.  For P <= ~8 this beats a length-nfft FFT by orders of
    magnitude and fuses into neighboring elementwise ops on the VPU.
    """
    coeffs = jnp.asarray(coeffs)
    P = coeffs.shape[0]
    zinv = rfft_phasor(nfft, coeffs.real.dtype if jnp.issubdtype(
        coeffs.dtype, jnp.complexfloating) else coeffs.dtype)
    zinv = zinv.reshape((-1,) + (1,) * (coeffs.ndim - 1))
    out = jnp.asarray(coeffs[P - 1], dtype=zinv.dtype)
    for k in range(P - 2, -1, -1):
        out = out * zinv + coeffs[k]
    return out


def cascade_prods(b, a, nfft: int):
    """``(prod_k polyval(b[:, k]), prod_k polyval(a[:, k]))`` on the rfft
    grid, evaluated as ONE fused Horner-and-multiply elementwise chain.

    b, a: (P, K, ...) tap-major SOS cascades.  Equivalent to
    ``jnp.prod(poly_response(b, nfft), axis=1)`` (same for a) but the
    (M, K, ...) per-section responses are never materialized — at
    nfft=96000 a (M, 13, 6) complex intermediate is ~30 MB per array, and
    the cascade modules (GEQ/PEQ/Biquad/SOS/SVF) pay that four times per
    training step (B, A, forward + backward).  The unrolled K-section
    chain fuses into a handful of VPU kernels instead."""
    b = jnp.asarray(b)
    a = jnp.asarray(a)
    P = b.shape[0]
    K = b.shape[1]
    rdtype = (b.real.dtype if jnp.issubdtype(b.dtype, jnp.complexfloating)
              else b.dtype)
    zinv = rfft_phasor(nfft, rdtype)
    zinv = zinv.reshape((-1,) + (1,) * (b.ndim - 2))

    def polyval(c):  # (P, ...) -> (M, ...)
        out = jnp.asarray(c[P - 1], dtype=zinv.dtype)
        for j in range(P - 2, -1, -1):
            out = out * zinv + c[j]
        return out

    prodB = polyval(b[:, 0])
    prodA = polyval(a[:, 0])
    for k in range(1, K):
        prodB = prodB * polyval(b[:, k])
        prodA = prodA * polyval(a[:, k])
    return prodB, prodA


def biquad2tf(b, a, nfft: int):
    """Cascade of biquads -> transfer function (reference functional.py:141-161).

    b, a: (3, n_sections).  Returns (nfft//2+1,)."""
    b = jnp.asarray(b)
    a = jnp.asarray(a)
    if b.ndim < 2:
        b = b[:, None]
    if a.ndim < 2:
        a = a[:, None]
    B = poly_response(b, nfft)
    A = poly_response(a, nfft)
    return jnp.prod(B, axis=1) / jnp.prod(A, axis=1)


def sosfreqz(sos, nfft: int = 512):
    """Frequency response of cascaded SOS (reference functional.py:807-824).

    sos: (n_sections, 6).  Returns (nfft//2+1,)."""
    sos = jnp.asarray(sos)
    assert sos.shape[-1] == 6
    B = poly_response(sos[:, :3].T, nfft)  # (M, n_sections)
    A = poly_response(sos[:, 3:].T, nfft)
    return jnp.prod(B, axis=-1) / jnp.prod(A, axis=-1)


# ----------------------------------------------------------------------
# signal gallery
# ----------------------------------------------------------------------
def signal_gallery(batch_size: int, n_samples: int, n: int,
                   signal_type: str = "impulse", fs: int = 48000,
                   rate: float = 1.0, reference=None, key=None,
                   dtype=jnp.float32):
    """Test-signal factory (reference functional.py:164-270).

    Returns (batch_size, n_samples, n).  Random types consume an explicit
    ``key`` (or the global stream via :func:`flamo_tpu.utils.next_key`).
    """
    types = {"impulse", "sine", "sweep", "wgn", "exp", "reference", "noise",
             "velvet"}
    if signal_type not in types:
        raise ValueError(f"Signal type {signal_type} not recognized.")

    if signal_type == "impulse":
        x = jnp.zeros((batch_size, n_samples, n), dtype=dtype)
        return x.at[:, 0, :].set(1.0)
    if signal_type == "sine":
        if rate is not None:
            t = jnp.linspace(0, n_samples / fs, n_samples, dtype=dtype)
            s = jnp.sin(2 * jnp.pi * rate / fs * t)
        else:
            s = jnp.sin(jnp.linspace(0, 2 * jnp.pi, n_samples, dtype=dtype))
        return jnp.broadcast_to(s[None, :, None], (batch_size, n_samples, n))
    if signal_type == "sweep":
        # linear chirp 20 Hz -> 20 kHz over the full duration
        t = jnp.linspace(0, n_samples / fs - 1 / fs, n_samples, dtype=dtype)
        t1 = t[-1]
        f0, f1 = 20.0, 20000.0
        phase = 2 * jnp.pi * (f0 * t + (f1 - f0) / (2 * t1) * t * t)
        x = jnp.cos(phase)
        return jnp.broadcast_to(x[None, :, None], (batch_size, n_samples, n))
    if signal_type in ("wgn", "noise"):
        return jax.random.normal(next_key(key), (batch_size, n_samples, n),
                                 dtype=dtype)
    if signal_type == "exp":
        x = jnp.exp(-rate * jnp.arange(n_samples, dtype=dtype) / fs)
        return jnp.broadcast_to(x[None, :, None], (batch_size, n_samples, n))
    if signal_type == "velvet":
        key = next_key(key)
        keys = jax.random.split(key, batch_size * n)
        seqs = [gen_velvet_noise(n_samples, fs, rate, key=k, dtype=dtype)
                for k in keys]
        x = jnp.stack(seqs).reshape(batch_size, n, n_samples)
        return jnp.transpose(x, (0, 2, 1))
    if signal_type == "reference":
        ref = jnp.asarray(reference, dtype=dtype)
        return jnp.broadcast_to(ref, (batch_size, n_samples, n))


def gen_velvet_noise(n_samples: int, fs: int, density: float, key=None,
                     dtype=jnp.float32):
    """Single velvet-noise sequence (reference functional.py:273-304)."""
    key = next_key(key)
    Td = fs / density
    floor_impulses = math.floor(n_samples / Td)
    k1, k2 = jax.random.split(key)
    grid = jnp.arange(floor_impulses, dtype=dtype) * Td
    jitter = jax.random.uniform(k1, (floor_impulses,), dtype=dtype)
    idx = jnp.ceil(grid + jitter * (Td - 1)).astype(jnp.int32)
    idx = idx.at[0].set(0)
    idx = jnp.clip(idx, 0, n_samples - 1)
    signs = 2 * jax.random.randint(k2, (floor_impulses,), 0, 2) - 1
    seq = jnp.zeros(n_samples, dtype=dtype)
    return seq.at[idx].set(signs.astype(dtype))


# ----------------------------------------------------------------------
# unit conversions
# ----------------------------------------------------------------------
def hertz2rad(hertz, fs: int):
    """f[Hz] -> omega[rad/sample] (reference functional.py:306-319)."""
    return jnp.asarray(hertz) / fs * 2 * jnp.pi


def rad2hertz(rad, fs: int):
    """omega[rad/sample] -> f[Hz] (reference functional.py:322-335)."""
    return jnp.asarray(rad) * fs / (2 * jnp.pi)


def db2mag(dB):
    return 10 ** (jnp.asarray(dB) / 20)


def mag2db(mag):
    return 20 * jnp.log10(jnp.abs(jnp.asarray(mag)))


# ----------------------------------------------------------------------
# RBJ-cookbook biquad coefficient galleries (reference functional.py:376-675)
# All vectorized over arbitrary fc shapes; return (3, *fc.shape).
# ----------------------------------------------------------------------
def lowpass_filter(fc=500.0, gain=0.0, fs: int = 48000, dtype=jnp.float32):
    """RBJ lowpass (reference functional.py:376-428)."""
    omegaC = hertz2rad(jnp.asarray(fc, dtype=dtype), fs)
    alpha = jnp.sin(omegaC) / 2 * jnp.sqrt(jnp.asarray(2.0, dtype=dtype))
    cosOC = jnp.cos(omegaC)
    b = jnp.stack([(1 - cosOC) / 2, 1 - cosOC, (1 - cosOC) / 2])
    a = jnp.stack([1 + alpha, -2 * cosOC, 1 - alpha])
    return 10 ** (jnp.asarray(gain, dtype=dtype) / 20) * b, a


def highpass_filter(fc=10000.0, gain=0.0, fs: int = 48000, dtype=jnp.float32):
    """RBJ highpass (reference functional.py:431-482)."""
    omegaC = hertz2rad(jnp.asarray(fc, dtype=dtype), fs)
    alpha = jnp.sin(omegaC) / 2 * jnp.sqrt(jnp.asarray(2.0, dtype=dtype))
    cosOC = jnp.cos(omegaC)
    b = jnp.stack([(1 + cosOC) / 2, -(1 + cosOC), (1 + cosOC) / 2])
    a = jnp.stack([1 + alpha, -2 * cosOC, 1 - alpha])
    return 10 ** (jnp.asarray(gain, dtype=dtype) / 20) * b, a


def bandpass_filter(fc1, fc2, gain=0.0, fs: int = 48000, dtype=jnp.float32):
    """RBJ bandpass (reference functional.py:485-552)."""
    fc1 = jnp.asarray(fc1, dtype=dtype)
    fc2 = jnp.asarray(fc2, dtype=dtype)
    omegaC = (hertz2rad(fc1, fs) + hertz2rad(fc2, fs)) / 2
    BW = jnp.log2(fc2 / fc1)
    two = jnp.asarray(2.0, dtype=dtype)
    alpha = jnp.sin(omegaC) * jnp.sinh(
        jnp.log(two) / two * BW * (omegaC / jnp.sin(omegaC))
    )
    cosOC = jnp.cos(omegaC)
    b = jnp.stack([alpha, jnp.zeros_like(alpha), -alpha])
    a = jnp.stack([1 + alpha, -2 * cosOC, 1 - alpha])
    return 10 ** (jnp.asarray(gain, dtype=dtype) / 20) * b, a


def shelving_filter(fc, gain, type: str = "low", fs: int = 48000,
                    dtype=jnp.float32):
    """Second-order shelving filter, linear gain (reference functional.py:555-622)."""
    fc = jnp.asarray(fc, dtype=dtype)
    gain = jnp.asarray(gain, dtype=dtype)
    omegaC = hertz2rad(fc, fs)
    t = jnp.tan(omegaC / 2)
    t2 = t ** 2
    g2 = gain ** 0.5
    g4 = gain ** 0.25
    sqrt2 = jnp.sqrt(jnp.asarray(2.0, dtype=dtype))
    b = jnp.stack([
        g2 * t2 + sqrt2 * t * g4 + 1,
        2 * g2 * t2 - 2,
        g2 * t2 - sqrt2 * t * g4 + 1,
    ])
    a = jnp.stack([
        g2 + sqrt2 * t * g4 + t2,
        2 * t2 - 2 * g2,
        g2 - sqrt2 * t * g4 + t2,
    ])
    b = g2 * b
    if type == "high":
        b, a = a * gain, b
    return b, a


def peak_filter(fc, gain, Q, fs: int = 48000, dtype=jnp.float32):
    """Second-order peak filter, linear gain (reference functional.py:625-675)."""
    fc = jnp.asarray(fc, dtype=dtype)
    gain = jnp.asarray(gain, dtype=dtype)
    Q = jnp.asarray(Q, dtype=dtype)
    omegaC = hertz2rad(fc, fs)
    t = jnp.tan(omegaC / Q / 2)
    sg = jnp.sqrt(gain)
    b = jnp.stack([sg + gain * t, -2 * sg * jnp.cos(omegaC), sg - gain * t])
    a = jnp.stack([sg + t, -2 * sg * jnp.cos(omegaC), sg - t])
    return b, a


def prop_shelving_filter(fc, gain, type: str = "low", fs: int = 48000,
                         dtype=jnp.float32):
    """Jot proportional first-order shelving, gain in dB
    (reference functional.py:678-745)."""
    fc = jnp.asarray(fc, dtype=dtype)
    gain = jnp.asarray(gain, dtype=dtype)
    t = jnp.tan(jnp.pi * fc / fs)
    k = 10 ** (gain / 20)
    if type == "low":
        b = jnp.stack([t * jnp.sqrt(k) + 1, t * jnp.sqrt(k) - 1])
        a = jnp.stack([t / jnp.sqrt(k) + 1, t / jnp.sqrt(k) - 1])
    elif type == "high":
        k = 1 / k
        b = jnp.stack([(t * jnp.sqrt(k) + 1) / k, (t * jnp.sqrt(k) - 1) / k])
        a = jnp.stack([t / jnp.sqrt(k) + 1, t / jnp.sqrt(k) - 1])
    else:
        raise ValueError("type must be 'low' or 'high'")
    return b, a


def prop_peak_filter(fc, bw, gain, fs: int = 48000, dtype=jnp.float32):
    """Jot proportional presence/peak filter, gain in dB
    (reference functional.py:748-804)."""
    fc = jnp.asarray(fc, dtype=dtype)
    bw = jnp.asarray(bw, dtype=dtype)
    gain = jnp.asarray(gain, dtype=dtype)
    t = jnp.tan(jnp.pi * bw / fs)
    c = jnp.cos(2 * jnp.pi * fc / fs)
    k = 10 ** (gain / 20)
    sk = jnp.sqrt(k)
    b = jnp.stack([1 + sk * t, -2 * c, 1 - sk * t])
    a = jnp.stack([1 + t / sk, -2 * c, 1 - t / sk])
    return b, a


def svf(fc, R, m=None, G=None, filter_type: str = None, fs: int = 48000,
        dtype=jnp.float32):
    """Functional state-variable-filter coefficients
    (reference functional.py:827-930).  Returns (b, a), each (3, *fc.shape)."""
    fc = jnp.asarray(fc, dtype=dtype)
    R = jnp.asarray(R, dtype=dtype)
    f = jnp.tan(jnp.pi * fc / fs)
    if G is None:
        G = jnp.ones_like(f)
    G = jnp.asarray(G, dtype=dtype)
    ones, zeros = jnp.ones_like(G), jnp.zeros_like(G)
    if filter_type == "lowpass":
        mix = (ones, zeros, zeros)
    elif filter_type == "highpass":
        mix = (zeros, zeros, ones)
    elif filter_type == "bandpass":
        mix = (zeros, ones, zeros)
    elif filter_type == "lowshelf":
        mix = (ones, 2 * R * jnp.sqrt(G), G)
    elif filter_type == "highshelf":
        mix = (G, 2 * R * jnp.sqrt(G), ones)
    elif filter_type in ("peaking", "notch"):
        mix = (ones, 2 * R * jnp.sqrt(G), ones)
    elif filter_type is None:
        m = jnp.asarray(m, dtype=dtype)
        mix = (m[..., 0], m[..., 1], m[..., 2])
    else:
        raise ValueError(f"unknown filter_type {filter_type}")
    mLP, mBP, mHP = mix
    b = jnp.stack([
        f**2 * mLP + f * mBP + mHP,
        2 * f**2 * mLP - 2 * mHP,
        f**2 * mLP - f * mBP + mHP,
    ])
    a = jnp.stack([f**2 + 2 * R * f + 1, 2 * f**2 - 2, f**2 - 2 * R * f + 1])
    return b, a


def probe_sos(sos, control_freqs, nfft: int, fs: int, dtype=jnp.float32):
    """Probe magnitude response of a cascaded SOS at control frequencies
    (reference functional.py:933-979).

    sos: (6, n_bands).  Returns (G, H, W): gains in dB at control freqs
    (n_ctrl, n_bands), full responses (M, n_bands), phases (M, n_bands).
    Vectorized over bands (the reference loops in Python)."""
    sos = jnp.asarray(sos, dtype=dtype)
    control_freqs = jnp.asarray(control_freqs, dtype=dtype)
    sos = sos / sos[3:4, :]
    B = poly_response(sos[:3], nfft)     # (M, n_bands)
    A = poly_response(sos[3:], nfft)
    H = B / (A + 1e-10)
    f = jnp.fft.rfftfreq(nfft, 1.0 / fs).astype(dtype)
    mag_db = 20 * jnp.log10(jnp.abs(H))
    G = jax.vmap(lambda col: RegularGridInterpolator([f], col)([control_freqs]),
                 in_axes=1, out_axes=1)(mag_db)
    W = jnp.broadcast_to((2 * jnp.pi * f / fs)[:, None], H.shape)
    return G, H, W


def find_onset(rir):
    """RIR onset via windowed local-energy maximum (reference functional.py:982-1023)."""
    rir = jnp.asarray(rir)
    win_len = 64
    overlap = 0.75
    win = jnp.hanning(win_len + 1)[:win_len].astype(rir.dtype)
    # reference uses torch.hann_window (periodic); jnp.hanning is symmetric
    win = 0.5 * (1 - jnp.cos(2 * jnp.pi * jnp.arange(win_len) / win_len))
    pad = int(win_len * overlap)
    x = jnp.pad(rir, (pad, pad))
    hop = 1 - overlap
    n_wins = int(np.floor(x.shape[0] / (win_len * hop) - 1 / 2 / hop))
    hop_len = int(win_len * hop)
    idx = jnp.arange(win_len)[None, :] + hop_len * jnp.arange(0, n_wins - 2)[:, None]
    frames = x[idx]
    local_energy = jnp.sum(frames**2 * win[None, :], axis=1)
    n_win_discard = int((overlap / hop) - (1 / 2 / hop))
    local_energy = local_energy[n_win_discard:]
    return int(win_len * hop * (int(jnp.argmax(local_energy)) - 1))


def WGN_reverb(matrix_size: tuple = (1, 1), t60: float = 1.0,
               samplerate: int = 48000, key=None, dtype=jnp.float32):
    """Exponentially-decaying white-noise IR matrix, bandpassed 20 Hz-20 kHz,
    column-normalized (reference functional.py:1026-1074)."""
    key = next_key(key)
    n_samples = int(1.5 * t60 * samplerate)
    noise = jax.random.normal(key, (n_samples, *matrix_size), dtype=dtype)
    dr = t60 / math.log(1000.0)
    decay = jnp.exp(-1 / dr * jnp.linspace(0, t60, n_samples, dtype=dtype))
    IRs = noise * decay.reshape(-1, *([1] * len(matrix_size)))
    TFs = jnp.fft.rfft(IRs, n=n_samples, axis=0)
    # reference hardcodes a 20 Hz - 20 kHz band (functional.py:1056-1058);
    # clamp the upper edge below Nyquist so low sample rates stay finite
    f_hi = min(20000.0, 0.95 * samplerate / 2)
    b, a = bandpass_filter(jnp.asarray([20.0]), jnp.asarray([f_hi]),
                           jnp.asarray([1.0]), fs=samplerate, dtype=dtype)
    sos = jnp.concatenate([b.reshape(1, 3), a.reshape(1, 3)], axis=1)
    bp_H = sosfreqz(sos=sos, nfft=n_samples).squeeze()
    bp_H = bp_H.reshape(-1, *([1] * len(matrix_size)))
    IRs = jnp.fft.irfft(TFs * bp_H, n=n_samples, axis=0)
    norms = jnp.linalg.norm(IRs, ord=2, axis=0)
    return IRs / norms
