"""Auxiliary-layer tests: eq design, scattering algebra, reverb factories,
filterbank, velvet."""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flamo_tpu
from flamo_tpu.auxiliary import eq, reverb, scattering
from flamo_tpu.auxiliary.config import HomogeneousFDNConfig
from flamo_tpu.auxiliary.filterbank import FilterBank
from flamo_tpu.auxiliary.velvet import VelvetNoiseFilter


# ----------------------------------------------------------------- eq
def test_eq_freqs_octave():
    center, shelving = eq.eq_freqs(interval=1)
    c = np.asarray(center)
    assert np.allclose(c[1:] / c[:-1], 2.0, rtol=1e-5)  # octave spacing
    assert float(shelving[0]) < c[0] and float(shelving[1]) > c[-1]


def test_geq_band_count_and_flat():
    center, shelving = eq.eq_freqs(interval=1)
    K = len(center) + 3
    b, a = eq.geq(center, shelving, 2.7, jnp.zeros(K), fs=48000)
    assert b.shape == (3, K) and a.shape == (3, K)
    # all 0 dB -> overall flat response
    from flamo_tpu.functional import poly_response

    H = np.prod(np.asarray(poly_response(b, 4096)), axis=1) / \
        np.prod(np.asarray(poly_response(a, 4096)), axis=1)
    assert np.abs(np.abs(H) - 1.0).max() < 1e-3


def test_accurate_geq_hits_targets():
    center, shelving = eq.eq_freqs(interval=1)
    rng = np.random.default_rng(0)
    target = rng.uniform(-6, 6, len(center) + 2)
    b, a = eq.accurate_geq(target, np.asarray(center), np.asarray(shelving),
                           fs=48000)
    from flamo_tpu.functional import poly_response

    nfft = 1 << 14
    H = np.prod(np.asarray(poly_response(b, nfft)), axis=1) / \
        np.prod(np.asarray(poly_response(a, nfft)), axis=1)
    f = np.fft.rfftfreq(nfft, 1 / 48000)
    mag = 20 * np.log10(np.abs(H))
    for cf, t in zip(np.asarray(center), target[1:-1]):
        idx = np.argmin(np.abs(f - cf))
        assert abs(mag[idx] - t) < 1.0, (cf, t, mag[idx])


def test_minimize_lbfgs_bounded():
    from flamo_tpu.auxiliary.minimize import minimize_LBFGS

    rng = np.random.default_rng(1)
    G = rng.normal(size=(20, 5))
    x_true = np.array([0.5, -1.0, 2.0, 0.0, 1.5])
    y = G @ x_true
    lower = -np.full(5, 3.0)
    upper = np.full(5, 3.0)
    x = minimize_LBFGS(G, y, lower, upper, num_freq=4)
    assert np.abs(x - x_true).max() < 1e-4


# ----------------------------------------------------------------- scattering
def test_poly_matrix_conv_matches_direct():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(3, 2, 4))
    B = rng.normal(size=(2, 5, 6))
    C = np.asarray(scattering.poly_matrix_conv(jnp.asarray(A),
                                               jnp.asarray(B)))
    # direct polynomial multiply
    ref = np.zeros((3, 5, 4 + 6 - 1))
    for i in range(3):
        for j in range(5):
            for k in range(2):
                ref[i, j] += np.convolve(A[i, k], B[k, j])
    assert np.abs(C - ref).max() < 1e-5


def test_scattering_mapping_paraunitary():
    N = 4
    m = scattering.ScatteringMapping(N, n_stages=2, sparsity=2,
                                     gain_per_sample=1.0,
                                     key=jax.random.PRNGKey(0))
    U = jnp.stack([flamo_tpu.functional.expm_skew(
        jax.random.normal(jax.random.PRNGKey(i), (N, N))) for i in range(3)])
    V = np.asarray(m(U))  # (T, N, N)
    # paraunitarity at z on the unit circle: V(z)^H V(z) = I
    for theta in [0.3, 1.1]:
        z = np.exp(1j * theta)
        Vz = sum(V[t] * z ** (-t) for t in range(V.shape[0]))
        assert np.abs(Vz.conj().T @ Vz - np.eye(N)).max() < 1e-4


def test_shift_matrix_static():
    X = jnp.ones((2, 2, 1))
    Y = np.asarray(scattering.shift_matrix_static(X, [1, 3], "left"))
    assert Y.shape == (2, 2, 4)
    assert Y[0, 0, 1] == 1.0 and Y[1, 0, 3] == 1.0


def test_hadamard_matrix():
    H = scattering.hadamard_matrix(8)
    assert np.allclose(H @ H.T, np.eye(8), atol=1e-10)


# ----------------------------------------------------------------- reverb
def test_rt2slope_and_absorption():
    assert float(reverb.rt2slope(jnp.asarray(1.0), 48000)) == \
        pytest.approx(-60 / 48000)
    ab = reverb.rt2absorption(jnp.asarray([1.0]), 48000,
                              jnp.asarray([100, 200]))
    assert np.allclose(np.asarray(ab), [[-0.125, -0.25]])


def test_map_gamma_roundtrip():
    delays = [89, 97]
    fwd = reverb.map_gamma(delays)
    inv = reverb.inverse_map_gamma(delays)
    x = jnp.asarray([[0.3, -0.2]])
    y = fwd(x)
    x_rec = inv(y)
    assert np.abs(np.asarray(x_rec - x[0])).max() < 1e-4


def test_homogeneous_fdn_factory():
    cfg = HomogeneousFDNConfig(N=4, nfft=2048, delays=[89, 97, 107, 113],
                               alias_decay_db=0)
    fdn = reverb.HomogeneousFDN(cfg)
    ir = fdn.model.get_time_response(fs=48000)
    assert ir.shape == (1, 2048, 1)
    assert np.isfinite(np.asarray(ir)).all()
    params = fdn.get_raw_parameters()
    assert set(params) == {"A", "attenuation", "B", "C", "m"}
    # roundtrip raw parameters
    fdn.set_raw_parameters(params)
    params2 = fdn.get_raw_parameters()
    for k in params:
        assert np.allclose(params[k], params2[k])


def test_homogeneous_fdn_normalize_energy():
    cfg = HomogeneousFDNConfig(N=4, nfft=2048, delays=[89, 97, 107, 113],
                               alias_decay_db=0)
    fdn = reverb.HomogeneousFDN(cfg)
    fdn.normalize_energy(target_energy=1.0)
    H = fdn.model.get_freq_response()
    assert abs(float(jnp.mean(jnp.abs(H) ** 2)) - 1.0) < 1e-3


def test_fdn_geq_trainable_attenuation():
    delays = jnp.asarray([89, 97, 107])
    g = reverb.parallelFDNGEQ(octave_interval=1, nfft=2048, fs=48000,
                              delays=delays, requires_grad=True)
    H = np.asarray(g.response())
    assert H.shape == (1025, 3)
    assert np.isfinite(H).all()
    # attenuation: |H| <= ~1 (decaying RTs)
    assert np.abs(H).max() < 1.3


def test_fdn_accurate_geq():
    delays = jnp.asarray([89, 97])
    g = reverb.parallelFDNAccurateGEQ(octave_interval=1, nfft=2048, fs=48000,
                                      delays=delays)
    H = np.asarray(g.response())
    assert H.shape == (1025, 2)
    assert np.isfinite(H).all()


def test_fdn_peq_variants():
    delays = jnp.asarray([89, 97])
    for design in ["biquad", "svf"]:
        for two in [False, True]:
            for prop in [False, True]:
                p = reverb.parallelFDNPEQ(n_bands=4, delays=delays,
                                          design=design, is_twostage=two,
                                          is_proportional=prop, nfft=1024,
                                          fs=48000, requires_grad=True)
                H = np.asarray(p.response())
                assert H.shape == (513, 2), (design, two, prop)
                assert np.isfinite(H).all(), (design, two, prop)


def test_first_order_shelving():
    delays = jnp.asarray([89, 97])
    f = reverb.parallelFirstOrderShelving(nfft=1024, fs=48000, rt_nyquist=0.2,
                                          delays=delays)
    f = f.assign_value(jnp.asarray([1.0, 1.0]))  # rt_DC 1s, omega_c 1 rad
    H = np.asarray(f.response())
    assert H.shape == (513, 2)
    # DC magnitude should equal the DC gain 10^(gain_DC/20)
    gain_DC = -60 / (1.0 * 48000) * np.asarray([89, 97])
    assert np.allclose(np.abs(H[0]), 10 ** (gain_DC / 20), atol=1e-3)


# ----------------------------------------------------------------- filterbank
def test_filterbank_partitions_energy():
    fb = FilterBank(fraction=1, order=3, fmin=60, fmax=8000,
                    sample_rate=48000, backend="fft")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4096, 1))
    y = fb(x)
    assert y.shape[0] == 1 and y.shape[1] == 4096 and y.shape[2] == 1
    assert y.shape[3] == len(fb.get_center_frequencies())
    assert np.isfinite(np.asarray(y)).all()


def test_filterbank_fft_matches_scipy():
    """Cross-backend parity (VERDICT r2 weak #6): the fft backend's
    zero-padded exact-grid multiplication must match causal scipy
    ``sosfilt`` sample-for-sample, and both share the
    (B, T, N, n_bands) output convention."""
    kw = dict(fraction=1, order=3, fmin=125, fmax=8000, sample_rate=48000)
    fb_fft = FilterBank(backend="fft", **kw)
    fb_sp = FilterBank(backend="scipy", **kw)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 8192, 2)).astype(np.float32))
    y_fft = np.asarray(fb_fft(x))
    y_sp = np.asarray(fb_sp(x))
    assert y_fft.shape == y_sp.shape == (2, 8192, 2,
                                         len(fb_fft.get_center_frequencies()))
    err = np.abs(y_fft - y_sp).max() / np.abs(y_sp).max()
    assert err < 1e-3, err


def test_filterbank_setters():
    fb = FilterBank(fraction=1, sample_rate=48000)
    fb.set_order(3)
    fb.set_center_frequencies([125, 250, 500])
    fb.set_sample_rate(44100)
    assert fb.get_center_frequencies() == [125, 250, 500]


# ----------------------------------------------------------------- velvet
def test_velvet_noise_filter():
    v = VelvetNoiseFilter(size=(480, 2, 1), density=1000.0, sample_rate=48000,
                          nfft=1024)
    p = np.asarray(v.param)
    nz = p[p != 0]
    assert set(np.unique(nz)).issubset({-1.0, 1.0})
    v2 = v.resample()
    assert not np.allclose(np.asarray(v2.param), p)
    H = v.response()
    assert H.shape == (513, 2, 1)


def test_fdn_attenuation_matrix_response_kinds():
    """All FDN attenuation filters are diagonal per-bin operators."""
    delays = jnp.asarray([89, 97])
    mods = [
        reverb.parallelFDNGEQ(octave_interval=1, nfft=512, fs=48000,
                              delays=delays),
        reverb.parallelFDNPEQ(n_bands=4, delays=delays, nfft=512, fs=48000),
        reverb.parallelFirstOrderShelving(nfft=512, fs=48000, delays=delays),
    ]
    for m in mods:
        kind, H = m.matrix_response()
        assert kind == "diag", type(m).__name__
        assert H.shape == (257, 2), type(m).__name__


@pytest.mark.parametrize("design,twostage,proportional", [
    ("biquad", False, False),
    ("biquad", True, True),
    ("svf", False, False),
    ("svf", True, False),
])
def test_fdn_peq_probe_matches_response(design, twostage, proportional):
    """parallelFDNPEQ.probe(z_m) on the rfft grid == response()[m]
    (e10 probe-consistency identity; was a NotImplementedError stub)."""
    import jax.numpy as jnp
    from flamo_tpu.auxiliary.reverb import parallelFDNPEQ

    nfft = 512
    peq = parallelFDNPEQ(n_bands=4, delays=(89, 97, 107), design=design,
                         is_twostage=twostage, is_proportional=proportional,
                         nfft=nfft, fs=48000, alias_decay_db=10.0)
    H = np.asarray(peq.response())  # (M, N)
    for m in [0, 17, 128, nfft // 2]:
        z = np.exp(1j * 2 * np.pi * m / nfft)
        Hp = np.asarray(peq.probe(jnp.asarray(z)))
        np.testing.assert_allclose(np.diag(Hp), H[m], rtol=5e-3, atol=5e-4)
