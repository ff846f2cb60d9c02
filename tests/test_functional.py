"""Unit tests for flamo_tpu.functional against scipy / closed-form oracles
(SURVEY.md §4 oracle (b): freq-sampled filters vs scipy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sps

from flamo_tpu import functional as F


def test_skew_and_expm_orthogonal():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8))
    S = F.skew_matrix(x)
    assert jnp.allclose(S, -S.T, atol=1e-6)
    U = F.expm(S)
    err = jnp.abs(U @ U.T - jnp.eye(8)).max()
    assert err < 1e-5
    # value check vs scipy
    import scipy.linalg as sla

    assert np.abs(np.asarray(U) - sla.expm(np.asarray(S))).max() < 1e-5


def test_expm_grad():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4))

    def f(x):
        return jnp.sum(jnp.abs(F.expm_skew(x)))

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()


def test_hadamard():
    H = F.hadamard_matrix_jnp(8)
    assert jnp.allclose(H @ H.T, jnp.eye(8), atol=1e-6)


def test_rotation_matrix_orthogonal():
    R = F.rotation_matrix(jnp.asarray(0.3), 4, iters=1)
    assert R.shape == (4, 4)
    assert jnp.allclose(R @ R.T, jnp.eye(4), atol=1e-6)


def test_poly_response_equals_rfft():
    nfft = 256
    coeffs = np.random.randn(3, 2, 5).astype(np.float32)
    ref = np.fft.rfft(np.concatenate(
        [coeffs, np.zeros((nfft - 3, 2, 5), np.float32)]), axis=0)
    out = F.poly_response(jnp.asarray(coeffs), nfft)
    assert np.abs(np.asarray(out) - ref).max() < 1e-4


@pytest.mark.parametrize("fc,design", [(500.0, "lowpass"), (8000.0, "highpass")])
def test_rbj_filters_vs_scipy(fc, design):
    fs = 48000
    if design == "lowpass":
        b, a = F.lowpass_filter(fc=jnp.asarray(fc), gain=0.0, fs=fs)
        b_ref, a_ref = sps.iirfilter(2, fc, btype="lowpass", ftype="butter",
                                     fs=fs)
    else:
        b, a = F.highpass_filter(fc=jnp.asarray(fc), gain=0.0, fs=fs)
        b_ref, a_ref = sps.iirfilter(2, fc, btype="highpass", ftype="butter",
                                     fs=fs)
    # RBJ with Q=1/sqrt(2) IS a 2nd-order Butterworth: compare magnitudes
    w, h_ref = sps.freqz(b_ref, a_ref, worN=128, fs=fs)
    h = np.asarray(F.biquad2tf(b, a, 256))[:128]
    w2 = np.fft.rfftfreq(256, 1 / fs)[:128]
    h_interp = np.interp(w, w2, np.abs(h))
    assert np.allclose(h_interp, np.abs(h_ref), rtol=0.05, atol=5e-3)


def test_bandpass_peak_at_center():
    fs = 48000
    b, a = F.bandpass_filter(jnp.asarray(500.0), jnp.asarray(2000.0), 0.0,
                             fs=fs)
    H = np.asarray(F.biquad2tf(b, a, 4096))
    f = np.fft.rfftfreq(4096, 1 / fs)
    center = np.sqrt(500 * 2000)
    peak_f = f[np.argmax(np.abs(H))]
    # RBJ's bandpass centers at the arithmetic-omega mean; allow wide margin
    assert 500 < peak_f < 2500
    assert np.abs(H)[np.argmin(np.abs(f - center))] > 0.5


def test_shelving_filter_gains():
    fs = 48000
    gain = 10 ** (6 / 20)
    b, a = F.shelving_filter(jnp.asarray(1000.0), jnp.asarray(gain), "low",
                             fs=fs)
    H = np.asarray(F.biquad2tf(b, a, 8192))
    # DC gain ~ g, Nyquist gain ~ 1
    assert np.abs(np.abs(H[0]) - gain) < 1e-2
    assert np.abs(np.abs(H[-1]) - 1.0) < 1e-2
    b, a = F.shelving_filter(jnp.asarray(1000.0), jnp.asarray(gain), "high",
                             fs=fs)
    H = np.asarray(F.biquad2tf(b, a, 8192))
    assert np.abs(np.abs(H[0]) - 1.0) < 1e-2
    assert np.abs(np.abs(H[-1]) - gain) < 1e-2


def test_peak_filter_gain_at_fc():
    fs = 48000
    gain = 10 ** (9 / 20)
    fc = 2000.0
    b, a = F.peak_filter(jnp.asarray(fc), jnp.asarray(gain),
                         jnp.asarray(2.0), fs=fs)
    H = np.asarray(F.biquad2tf(b, a, 1 << 14))
    f = np.fft.rfftfreq(1 << 14, 1 / fs)
    idx = np.argmin(np.abs(f - fc))
    assert np.abs(np.abs(H[idx]) - gain) < 0.05
    assert np.abs(np.abs(H[0]) - 1.0) < 1e-2


def test_prop_shelving_dc_nyquist():
    fs = 48000
    b, a = F.prop_shelving_filter(jnp.asarray(1000.0), jnp.asarray(6.0),
                                  "low", fs=fs)
    H = np.asarray(F.poly_response(b, 8192) / F.poly_response(a, 8192))
    assert np.abs(20 * np.log10(np.abs(H[0])) - 6.0) < 0.1
    assert np.abs(20 * np.log10(np.abs(H[-1]))) < 0.1


def test_svf_types_match_biquad_forms():
    fs = 48000
    fc = jnp.asarray(1000.0)
    R = jnp.asarray(1.0 / np.sqrt(2))
    b, a = F.svf(fc, R, filter_type="lowpass", fs=fs)
    H = np.asarray(F.biquad2tf(b, a, 8192))
    # lowpass: unit DC, vanishing Nyquist
    assert np.abs(np.abs(H[0]) - 1.0) < 1e-3
    assert np.abs(H[-1]) < 1e-3
    b, a = F.svf(fc, R, filter_type="highpass", fs=fs)
    H = np.asarray(F.biquad2tf(b, a, 8192))
    assert np.abs(H[0]) < 1e-3
    assert np.abs(np.abs(H[-1]) - 1.0) < 1e-3


def test_sosfreqz_vs_scipy():
    # seeded: unseeded draws occasionally land near-unstable sections where
    # |H| blows up past the absolute tolerance
    sos = np.random.default_rng(42).standard_normal((3, 6))
    sos[:, 3] = 1.0  # a0 = 1
    H = np.asarray(F.sosfreqz(jnp.asarray(sos), nfft=512))
    grid = np.fft.rfftfreq(512) * 2 * np.pi  # rfft grid includes pi
    w, h_ref = sps.sosfreqz(sos, worN=grid)
    assert np.abs(H - h_ref).max() < 1e-3


def test_signal_gallery_shapes_and_types():
    for t in ["impulse", "sine", "sweep", "exp", "wgn", "velvet"]:
        x = F.signal_gallery(2, 128, 3, signal_type=t, fs=8000, rate=100.0)
        assert x.shape == (2, 128, 3), t
    imp = F.signal_gallery(1, 16, 2, "impulse")
    assert float(imp[0, 0, 0]) == 1.0 and float(jnp.abs(imp[:, 1:]).max()) == 0.0


def test_velvet_noise_properties():
    x = np.asarray(F.gen_velvet_noise(4800, 48000, 1000.0,
                                      key=jax.random.PRNGKey(3)))
    nz = x[x != 0]
    assert set(np.unique(nz)).issubset({-1.0, 1.0})
    # ~ density * duration impulses
    assert 80 <= len(nz) <= 100


def test_conversions():
    assert np.isclose(float(F.db2mag(20.0)), 10.0)
    assert np.isclose(float(F.mag2db(jnp.asarray(10.0))), 20.0)
    assert np.isclose(float(F.hertz2rad(jnp.asarray(24000.0), 48000)), np.pi)
    assert np.isclose(float(F.rad2hertz(jnp.asarray(np.pi), 48000)), 24000.0)


def test_get_eigenvalues_host_callback():
    A = np.random.randn(5, 4, 4).astype(np.float32)
    ev = np.asarray(F.get_eigenvalues(jnp.asarray(A)))
    ref = np.linalg.eigvals(A)
    # eigenvalues unordered: compare sorted by real then imag
    def s(x):
        return np.sort_complex(x)
    for i in range(5):
        assert np.allclose(s(ev[i]), s(ref[i]), atol=1e-4)


def test_spectral_radius_matches_eig():
    rng = np.random.default_rng(3)
    # complex batch
    A = (rng.standard_normal((7, 5, 5)) +
         1j * rng.standard_normal((7, 5, 5))).astype(np.complex64)
    rho = np.asarray(F.spectral_radius(jnp.asarray(A), iters=128))
    ref = np.abs(np.linalg.eigvals(A)).max(axis=-1)
    assert np.allclose(rho, ref, rtol=5e-3)
    # real matrix whose dominant eigenvalues are a conjugate pair — the
    # per-step power-iteration ratio oscillates; the tail geometric mean
    # must still converge to |lambda|
    th, r = 0.7, 2.0
    R = np.array([[r * np.cos(th), -r * np.sin(th)],
                  [r * np.sin(th), r * np.cos(th)]])
    B = np.zeros((4, 4))
    B[:2, :2] = R
    B[2, 2], B[3, 3] = 0.5, -0.3
    Q = np.linalg.qr(rng.standard_normal((4, 4)))[0]
    Areal = (Q @ B @ Q.T).astype(np.float32)
    rho = float(F.spectral_radius(jnp.asarray(Areal), iters=128, tail=16))
    assert np.isclose(rho, r, rtol=5e-3)
    # differentiable and jittable
    g = jax.grad(lambda a: F.spectral_radius(a, iters=32).sum())(
        jnp.asarray(Areal))
    assert np.isfinite(np.asarray(g)).all()


def test_wgn_reverb_normalized():
    ir = F.WGN_reverb((2, 3), t60=0.1, samplerate=48000,
                      key=jax.random.PRNGKey(1))
    norms = jnp.linalg.norm(ir, axis=0)
    assert jnp.allclose(norms, 1.0, atol=1e-4)


def test_probe_sos_matches_direct():
    sos = np.random.randn(6, 2).astype(np.float64)
    sos[3] = 1.0
    G, H, W = F.probe_sos(jnp.asarray(sos), jnp.asarray([100.0, 1000.0]),
                          nfft=1024, fs=48000, dtype=jnp.float64)
    assert G.shape == (2, 2)
    assert H.shape == (513, 2)


def test_find_onset():
    rir = np.zeros(2048, dtype=np.float32)
    onset = 500
    rir[onset:onset + 200] = np.random.default_rng(0).normal(
        size=200).astype(np.float32) * np.exp(-np.arange(200) / 40)
    est = F.find_onset(jnp.asarray(rir))
    assert abs(est - onset) < 64  # within one window of the true onset


def _match_sets(a, b):
    """Greedy max abs-error between two eigenvalue sets (order-free —
    sort ties on conjugate pairs flip between backends)."""
    import numpy as np

    rows_err = []
    a = np.asarray(a).reshape(-1, a.shape[-1])
    b = np.asarray(b).reshape(-1, b.shape[-1])
    for ra, rb in zip(a, b):
        pool = list(rb)
        worst = 0.0
        for z in ra:
            j = int(np.argmin(np.abs(np.array(pool) - z)))
            worst = max(worst, abs(pool.pop(j) - z))
        rows_err.append(worst / max(1e-30, np.abs(rb).max()))
    return max(rows_err)


def test_charpoly_matches_numpy():
    import numpy as np

    rng = np.random.default_rng(3)
    A = (rng.normal(size=(7, 5, 5))
         + 1j * rng.normal(size=(7, 5, 5))).astype(np.complex64)
    c = np.asarray(jax.jit(F.charpoly)(jnp.asarray(A)))
    for i in range(7):
        ref = np.poly(A[i])  # monic coefficients incl. leading 1
        rel = np.abs(c[i] - ref[1:]).max() / np.abs(ref).max()
        assert rel < 1e-5, (i, rel)


def test_eigvals_dk_matches_lapack():
    """On-device char-poly eigensolver vs LAPACK over complex AND real
    batches for every gated N (real matrices carry conjugate pairs whose
    sort order flips between backends — matched as sets)."""
    import numpy as np

    rng = np.random.default_rng(11)
    for N in range(2, F.EIG_DK_MAX_N + 1):
        Ac = (rng.normal(size=(40, N, N))
              + 1j * rng.normal(size=(40, N, N))).astype(np.complex64)
        Ar = rng.normal(size=(40, N, N)).astype(np.float32)
        for A in (Ac, Ar):
            ref = np.linalg.eigvals(A)
            dk = np.asarray(jax.jit(F.eigvals_dk)(jnp.asarray(A)))
            assert dk.shape == ref.shape
            err = _match_sets(dk, ref)
            assert err < 1e-4, (N, A.dtype, err)


def test_eigvals_dk_grad_matches_callback():
    """poly_roots' implicit-function VJP vs the LAPACK eigvector VJP
    through an order-free loss (sorted magnitudes — the mse_evs shape)."""
    import numpy as np

    rng = np.random.default_rng(12)
    A = jnp.asarray((rng.normal(size=(6, 4, 4))
                     + 1j * rng.normal(size=(6, 4, 4))).astype(np.complex64))
    t = jnp.asarray(rng.uniform(size=(6, 4)).astype(np.float32))

    def loss(eig_fn, A):
        m = jnp.sort(jnp.abs(eig_fn(A)), axis=-1)
        return jnp.mean((m - t) ** 2)

    l_dk = float(loss(F.eigvals_dk, A))
    l_cb = float(loss(F.eigvals_lapack, A))
    assert abs(l_dk - l_cb) / abs(l_cb) < 1e-5
    g_dk = jax.grad(lambda A: loss(F.eigvals_dk, A))(A)
    g_cb = jax.grad(lambda A: loss(F.eigvals_lapack, A))(A)
    rel = float(jnp.abs(g_dk - g_cb).max() / jnp.abs(g_cb).max())
    assert rel < 5e-3, rel

    # real input: gradient must stay real (tangent-space projection)
    Ar = jnp.asarray(rng.normal(size=(4, 3, 3)).astype(np.float32))
    tr = jnp.asarray(rng.uniform(size=(4, 3)).astype(np.float32))

    def loss_r(A):
        m = jnp.sort(jnp.abs(F.eigvals_dk(A)), axis=-1)
        return jnp.mean((m - tr) ** 2)

    gr = jax.grad(loss_r)(Ar)
    assert gr.dtype == Ar.dtype
    assert bool(jnp.all(jnp.isfinite(gr)))


def test_eigvals_dk_repeated_spectra_degrade_gracefully():
    """Repeated/defective spectra have unbounded eig sensitivity (same
    contract as LAPACK-VJP eigvals); the DK solver must still return
    finite roots at the theoretically-expected accuracy: exact for a
    pure Jordan block (centering reduces its char-poly to z^N), ~sqrt(eps)
    clustering for a diagonalizable double root."""
    import numpy as np

    J = jnp.asarray(np.array([[2, 1, 0], [0, 2, 1], [0, 0, 2]], np.float32))
    w = np.asarray(F.eigvals_dk(J))
    assert np.all(np.isfinite(w.view(np.float32)))
    assert np.abs(w - 2.0).max() < 1e-5

    D = jnp.asarray(np.diag([1.0, 1.0, 3.0]).astype(np.float32))
    w2 = np.sort_complex(np.asarray(F.eigvals_dk(D)))
    assert np.all(np.isfinite(w2.view(np.float32)))
    assert abs(w2[-1] - 3.0) < 1e-5
    assert np.abs(w2[:2] - 1.0).max() < 5e-3  # double root: O(sqrt(eps))


def test_poly_roots_rows_matches_complex_path():
    """poly_roots_rows (lanes-major re/im twin used by the fused
    eigenvalue training step) matches poly_roots on both the forward
    roots and the implicit-function VJP through an order-free
    sorted-magnitude loss (the mse_evs shape)."""
    import numpy as np

    rng = np.random.default_rng(21)
    N, B = 4, 64
    c = (rng.normal(size=(B, N))
         + 1j * rng.normal(size=(B, N))).astype(np.complex64)
    cr = jnp.asarray(np.real(c).T.copy())  # (N, B) rows
    ci = jnp.asarray(np.imag(c).T.copy())
    t = jnp.asarray(rng.uniform(size=(N, B)).astype(np.float32))

    zr, zi = jax.jit(F.poly_roots_rows)(cr, ci)
    assert zr.shape == (N, B) and zi.shape == (N, B)
    z_ref = np.asarray(jax.jit(F.poly_roots)(jnp.asarray(c)))
    err = _match_sets(np.asarray(jax.lax.complex(zr, zi)).T, z_ref)
    assert err < 1e-4, err

    def loss_rows(cr, ci):
        zr, zi = F.poly_roots_rows(cr, ci)
        m = jnp.sort(jnp.sqrt(zr * zr + zi * zi), axis=0)
        return jnp.mean((m - t) ** 2)

    def loss_cplx(cr, ci):
        z = F.poly_roots(jax.lax.complex(cr, ci).T)
        m = jnp.sort(jnp.abs(z), axis=-1).T
        return jnp.mean((m - t) ** 2)

    l_r = float(loss_rows(cr, ci))
    l_c = float(loss_cplx(cr, ci))
    assert abs(l_r - l_c) / abs(l_c) < 1e-5
    gr_r = jax.grad(loss_rows, argnums=(0, 1))(cr, ci)
    gr_c = jax.grad(loss_cplx, argnums=(0, 1))(cr, ci)
    for a, b in zip(gr_r, gr_c):
        rel = float(jnp.abs(a - b).max() / jnp.abs(b).max())
        assert rel < 1e-4, rel


def test_charpoly_pins_highest_precision():
    """Regression guard for the bf16 footgun (CLAUDE.md 2026-08-17): on
    TPU the default matmul precision is bf16 passes, which put ~1e-3 on
    the char-poly coefficients and hence the roots — with perfectly
    converged-looking DK residuals.  charpoly therefore pins every
    dot_general to Precision.HIGHEST internally; this test fails if that
    pin is ever dropped (the numeric effect is invisible on the CPU test
    backend, where default precision is already f32)."""
    import numpy as np

    A = jnp.asarray(np.eye(6, dtype=np.complex64)[None])
    jaxpr = jax.make_jaxpr(F.charpoly)(A)
    dots = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "dot_general"]
    assert dots, "charpoly no longer lowers to dot_general — update test"
    for e in dots:
        prec = e.params.get("precision")
        assert prec is not None and all(
            p == jax.lax.Precision.HIGHEST for p in np.ravel([prec])
        ), f"charpoly dot_general lost its HIGHEST pin: {prec}"


def test_charpoly_bf16_failure_mode_documented():
    """Pins the magnitude of the bf16 failure mode itself: running the
    Faddeev-LeVerrier recursion with bf16-rounded matmul inputs degrades
    the roots to ~1e-3 while the f32 path stays ~1e-5 — the reason
    charpoly pins HIGHEST and why DK residuals alone cannot diagnose it
    (the roots of the WRONG polynomial still converge perfectly)."""
    import numpy as np

    rng = np.random.default_rng(5)
    A = (rng.normal(size=(16, 6, 6))
         + 1j * rng.normal(size=(16, 6, 6))).astype(np.complex64)
    ref = np.linalg.eigvals(A)

    def bf16_round(x):
        return (jnp.real(x).astype(jnp.bfloat16).astype(jnp.float32)
                + 1j * jnp.imag(x).astype(jnp.bfloat16).astype(jnp.float32)
                ).astype(x.dtype)

    def charpoly_bf16(A):
        N = A.shape[-1]
        eye = jnp.eye(N, dtype=A.dtype)
        Mk = A
        c = -jnp.trace(Mk, axis1=-2, axis2=-1)
        cs = [c]
        for k in range(2, N + 1):
            Mk = jnp.matmul(bf16_round(A),
                            bf16_round(Mk + c[..., None, None] * eye))
            c = -jnp.trace(Mk, axis1=-2, axis2=-1) / k
            cs.append(c)
        return jnp.stack(cs, axis=-1)

    z_good = np.asarray(F.poly_roots(F.charpoly(jnp.asarray(A))))
    z_bad = np.asarray(F.poly_roots(charpoly_bf16(jnp.asarray(A))))
    err_good = _match_sets(z_good, ref)
    err_bad = _match_sets(z_bad, ref)
    assert err_good < 1e-4, err_good
    assert err_bad > 10 * err_good, (err_bad, err_good)


def test_eigvals_qr_matches_lapack():
    """On-device Hessenberg+shifted-QR eigensolver (ops.qr_eig) vs
    LAPACK above the char-poly gate (reference functional.py:24-39
    computes torch.linalg.eigvals for ANY N; on the callback-less axon
    backend this solver is what lifts the old N<=8 ceiling)."""
    import numpy as np

    rng = np.random.default_rng(7)
    for N in (13, 16):
        Ac = (rng.normal(size=(6, N, N))
              + 1j * rng.normal(size=(6, N, N))).astype(np.complex64)
        Ar = rng.normal(size=(6, N, N)).astype(np.float32)
        for A in (Ac, Ar):
            ref = np.linalg.eigvals(A)
            z = np.asarray(jax.jit(F.eigvals_qr)(jnp.asarray(A)))
            assert z.shape == ref.shape
            err = _match_sets(z, ref)
            assert err < 1e-4, (N, A.dtype, err)


def test_eigvals_qr_hard_spectra():
    """Clustered eigenvalues (1e-3 separation) and a circulant
    permutation block (the Wilkinson-shift cycling hazard the
    exceptional shift exists for)."""
    import numpy as np

    rng = np.random.default_rng(8)
    N = 12
    d = np.concatenate([np.full(N // 2, 1.0),
                        np.full(N - N // 2, 1.0 + 1e-3)])
    Q = np.linalg.qr(rng.normal(size=(N, N))
                     + 1j * rng.normal(size=(N, N)))[0]
    A = (Q @ np.diag(d) @ Q.conj().T).astype(np.complex64)[None]
    err = _match_sets(np.asarray(F.eigvals_qr(jnp.asarray(A))),
                      np.linalg.eigvals(A))
    assert err < 1e-4, err

    P = np.eye(10, dtype=np.complex64)[list(range(1, 10)) + [0]][None]
    err = _match_sets(np.asarray(F.eigvals_qr(jnp.asarray(P))),
                      np.linalg.eigvals(P))
    assert err < 1e-4, err


@pytest.mark.slow
def test_eigvals_qr_n32():
    """Full gated range (compile-heavy: the Hessenberg unroll grows
    with N)."""
    import numpy as np

    rng = np.random.default_rng(9)
    A = (rng.normal(size=(4, 32, 32))
         + 1j * rng.normal(size=(4, 32, 32))).astype(np.complex64)
    err = _match_sets(np.asarray(jax.jit(F.eigvals_qr)(jnp.asarray(A))),
                      np.linalg.eigvals(A))
    assert err < 1e-4, err


@pytest.mark.slow
def test_eigvals_qr_n64():
    """Top of the gated range (EIG_QR_MAX_N = 64): values vs LAPACK and
    the inverse-iteration VJP vs the LAPACK eigvector VJP."""
    import numpy as np

    rng = np.random.default_rng(17)
    A = (rng.normal(size=(2, 64, 64))
         + 1j * rng.normal(size=(2, 64, 64))).astype(np.complex64)
    Aj = jnp.asarray(A)
    err = _match_sets(np.asarray(jax.jit(F.eigvals_qr)(Aj)),
                      np.linalg.eigvals(A))
    assert err < 1e-4, err

    t = jnp.asarray(rng.uniform(size=(2, 64)).astype(np.float32))

    def loss(eig_fn, A):
        m = jnp.sort(jnp.abs(eig_fn(A)), axis=-1)
        return jnp.mean((m - t) ** 2)

    g_qr = jax.grad(lambda A: loss(F.eigvals_qr_grad, A))(Aj)
    g_cb = jax.grad(lambda A: loss(F.eigvals_lapack, A))(Aj)
    rel = float(jnp.abs(g_qr - g_cb).max() / jnp.abs(g_cb).max())
    assert rel < 5e-3, rel


@pytest.mark.slow
def test_eigvals_qr_n128():
    """Top of the raised gate (EIG_QR_MAX_N = 128, round 5): values vs
    LAPACK.  The same shapes ran ON the axon tunnel 2026-08-19:
    set-match 3.4e-5, compile 51 s, steady-state ~1 ms for 8x128x128
    (one fetch-phase flake, reran clean — the known transfer pathology).
    Grad parity is pinned at N=64 (above); the N=128 VJP only adds the
    documented (B, N, N, N) eigenvector-recovery memory cost."""
    import numpy as np

    rng = np.random.default_rng(23)
    A = ((rng.normal(size=(2, 128, 128))
          + 1j * rng.normal(size=(2, 128, 128))) / np.sqrt(128)
         ).astype(np.complex64)
    err = _match_sets(np.asarray(jax.jit(F.eigvals_qr)(jnp.asarray(A))),
                      np.linalg.eigvals(A))
    assert err < 2e-4, err


def test_get_eigenvalues_qr_dispatch(monkeypatch):
    """On callback-less backends get_eigenvalues must route every
    N > EIG_DK_MAX_N to the QR solver — ANY N, matching the reference's
    torch.linalg.eigvals semantics (round 5 removed the N-ceiling; the
    dynamic Hessenberg compiles in O(1) statements)."""
    import numpy as np

    import flamo_tpu.functional as Fm
    import flamo_tpu.ops.qr_eig as qr_eig

    monkeypatch.setattr(Fm, "_callbacks_unsupported", lambda: True)
    rng = np.random.default_rng(10)
    A = (rng.normal(size=(3, 16, 16))
         + 1j * rng.normal(size=(3, 16, 16))).astype(np.complex64)
    z = np.asarray(Fm.get_eigenvalues(jnp.asarray(A)))
    err = _match_sets(z, np.linalg.eigvals(A))
    assert err < 1e-4, err
    z16 = np.asarray(Fm.eigvals(jnp.asarray(A)))
    err = _match_sets(z16, np.linalg.eigvals(A))
    assert err < 1e-4, err
    # large N routes to the QR solver instead of refusing (sentinel
    # stubs keep the fast gate fast — real large-N accuracy is pinned
    # by the slow N=128/N=192 tests)
    from flamo_tpu.ops.qr_eig import EIG_QR_MAX_N

    nbig = EIG_QR_MAX_N + 72
    big = jnp.zeros((2, nbig, nbig), jnp.complex64)
    calls = []
    monkeypatch.setattr(qr_eig, "eigvals_qr",
                        lambda a, *aa, **kk: calls.append("qr")
                        or jnp.zeros(a.shape[:-1], jnp.complex64))
    monkeypatch.setattr(qr_eig, "eigvals_qr_grad",
                        lambda a, *aa, **kk: calls.append("qr_grad")
                        or jnp.zeros(a.shape[:-1], jnp.complex64))
    assert Fm.get_eigenvalues(big).shape == (2, nbig)
    assert Fm.eigvals(big).shape == (2, nbig)
    assert calls == ["qr", "qr_grad"]


def test_hessenberg_dyn_matches_static():
    """The mask-based dynamic-loop Hessenberg (used above
    _HESS_STATIC_MAX_N, where the static unroll's compile cost is
    prohibitive) is the same math as the static reduction."""
    import numpy as np

    from flamo_tpu.ops.qr_eig import _hessenberg, _hessenberg_dyn

    rng = np.random.default_rng(5)
    A = (rng.normal(size=(3, 12, 12))
         + 1j * rng.normal(size=(3, 12, 12))).astype(np.complex64)
    Hs = np.asarray(_hessenberg(jnp.asarray(A)))
    Hd = np.asarray(jax.jit(_hessenberg_dyn)(jnp.asarray(A)))
    assert np.abs(Hs - Hd).max() < 1e-5 * np.abs(Hs).max()
    # strictly-lower part (below the first subdiagonal) is annihilated
    tri = np.tril(np.ones((12, 12)), -2).astype(bool)
    assert np.abs(Hd[:, tri]).max() < 1e-5 * np.abs(Hd).max()


@pytest.mark.slow
def test_eigvals_qr_n192_dynamic_hessenberg():
    """Above _HESS_STATIC_MAX_N the solver has NO ceiling: N=192 runs
    through the dynamic-loop Hessenberg with O(1) compiled statements
    (the old static unroll took ~51 s to COMPILE at N=128 on the
    tunnel and would grow from there)."""
    import numpy as np

    rng = np.random.default_rng(29)
    A = ((rng.normal(size=(1, 192, 192))
          + 1j * rng.normal(size=(1, 192, 192))) / np.sqrt(192)
         ).astype(np.complex64)
    err = _match_sets(np.asarray(jax.jit(F.eigvals_qr)(jnp.asarray(A))),
                      np.linalg.eigvals(A))
    assert err < 5e-4, err


def test_eigvals_qr_grad_matches_callback():
    """The inverse-iteration eigenvector VJP (eigvals_qr_grad) vs the
    LAPACK eigvector VJP through an order-free loss (sorted magnitudes,
    the mse_evs shape) at N=16 — above the char-poly solver's ceiling,
    where this is the only trainable route on callback-less backends."""
    import numpy as np

    rng = np.random.default_rng(21)
    A = jnp.asarray((rng.normal(size=(4, 16, 16)) + 1j * rng.normal(
        size=(4, 16, 16))).astype(np.complex64))
    t = jnp.asarray(rng.uniform(size=(4, 16)).astype(np.float32))

    def loss(eig_fn, A):
        m = jnp.sort(jnp.abs(eig_fn(A)), axis=-1)
        return jnp.mean((m - t) ** 2)

    l_qr = float(loss(F.eigvals_qr_grad, A))
    l_cb = float(loss(F.eigvals_lapack, A))
    assert abs(l_qr - l_cb) / abs(l_cb) < 1e-4
    g_qr = jax.jit(jax.grad(lambda A: loss(F.eigvals_qr_grad, A)))(A)
    g_cb = jax.grad(lambda A: loss(F.eigvals_lapack, A))(A)
    rel = float(jnp.abs(g_qr - g_cb).max() / jnp.abs(g_cb).max())
    assert rel < 5e-3, rel

    # real input: gradient must stay real (tangent-space projection)
    Ar = jnp.asarray(rng.normal(size=(3, 12, 12)).astype(np.float32))
    tr = jnp.asarray(rng.uniform(size=(3, 12)).astype(np.float32))

    def loss_r(eig_fn, A):
        m = jnp.sort(jnp.abs(eig_fn(A)), axis=-1)
        return jnp.mean((m - tr) ** 2)

    gr = jax.grad(lambda A: loss_r(F.eigvals_qr_grad, A))(Ar)
    assert gr.dtype == Ar.dtype
    g_cbr = jax.grad(lambda A: loss_r(F.eigvals_lapack, A))(Ar)
    rel_r = float(jnp.abs(gr - g_cbr).max() / jnp.abs(g_cbr).max())
    assert rel_r < 5e-3, rel_r
