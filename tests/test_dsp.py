"""Processor-module tests against time-domain / scipy oracles
(SURVEY.md §4 oracles (b) and (c))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sps

import flamo_tpu
from flamo_tpu.processor import dsp


NFFT = 1024
M = NFFT // 2 + 1


def spec(n_in, batch=1, value=1.0):
    return jnp.full((batch, M, n_in), value, dtype=jnp.complex64)


# ---------------------------------------------------------------- gains
def test_gain_forward_and_probe():
    g = dsp.Gain(size=(3, 2), nfft=NFFT)
    x = spec(2)
    y = g(x)
    assert y.shape == (1, M, 3)
    expected = np.asarray(g.param) @ np.ones(2)
    assert np.allclose(np.asarray(y[0, 0]), expected, atol=1e-5)
    assert np.allclose(np.asarray(g.probe(1.0 + 0j)), np.asarray(g.param),
                       atol=1e-6)


def test_gain_wrong_input_channels_raises():
    g = dsp.Gain(size=(3, 2), nfft=NFFT)
    with pytest.raises(ValueError):
        g(spec(4))


def test_parallel_gain_diagonal():
    g = dsp.parallelGain(size=(3,), nfft=NFFT)
    y = g(spec(3))
    assert np.allclose(np.asarray(y[0, 5]), np.asarray(g.param), atol=1e-6)
    P = g.probe(1.0 + 0j)
    assert np.allclose(np.asarray(P), np.diag(np.asarray(g.param)), atol=1e-6)


def test_gain_ext_param():
    g = dsp.Gain(size=(2, 2), nfft=NFFT)
    ext = jnp.eye(2)
    y = g(spec(2), ext_param=ext)
    assert np.allclose(np.asarray(y[0, 0]), np.ones(2), atol=1e-6)
    # functional: module param unchanged
    assert not np.allclose(np.asarray(g.param), np.asarray(ext))


def test_matrix_types():
    for mtype in ["random", "orthogonal", "hadamard", "rotation"]:
        m = dsp.Matrix(size=(4, 4), nfft=NFFT, matrix_type=mtype)
        U = np.asarray(m.map(m.param))
        if mtype != "random":
            assert np.abs(U @ U.T - np.eye(4)).max() < 1e-5, mtype


def test_householder():
    h = dsp.HouseholderMatrix(size=(4, 4), nfft=NFFT)
    x = spec(4)
    y = h(x)
    U = np.asarray(h.probe(1.0 + 0j))
    assert np.abs(U @ U.conj().T - np.eye(4)).max() < 1e-5
    assert np.allclose(np.asarray(y[0, 0]), U @ np.ones(4), atol=1e-5)


# ---------------------------------------------------------------- FIR
def test_filter_matches_scipy_fir():
    taps = 16
    f = dsp.Filter(size=(taps, 1, 1), nfft=NFFT)
    H = np.asarray(f.response())[:, 0, 0]
    h_ref = np.fft.rfft(np.asarray(f.param)[:, 0, 0], NFFT)
    assert np.abs(H - h_ref).max() < 1e-4


def test_filter_time_domain_convolution():
    taps = 8
    flamo_tpu.set_seed(3)
    f = dsp.Filter(size=(taps, 2, 1), nfft=NFFT)
    x_time = np.random.randn(NFFT // 2).astype(np.float32)
    X = jnp.fft.rfft(jnp.asarray(x_time)[None, :, None], n=NFFT, axis=1)
    y = jnp.fft.irfft(f(X), n=NFFT, axis=1)
    ref = np.stack([
        np.convolve(x_time, np.asarray(f.param)[:, o, 0])[:NFFT]
        for o in range(2)], axis=1)
    ref = np.pad(ref, ((0, NFFT - ref.shape[0]), (0, 0)))
    assert np.abs(np.asarray(y[0]) - ref).max() < 1e-3


def test_filter_alias_envelope():
    taps = 8
    f0 = dsp.Filter(size=(taps, 1, 1), nfft=NFFT, alias_decay_db=0)
    f1 = f0.replace(alias_decay_db=60.0)
    gamma = 10 ** (-60 / NFFT / 20)
    H0 = np.asarray(f0.response())[:, 0, 0]
    H1 = np.asarray(f1.response())[:, 0, 0]
    env = gamma ** np.arange(taps)
    h_ref = np.fft.rfft(np.asarray(f0.param)[:, 0, 0] * env, NFFT)
    assert np.abs(H1 - h_ref).max() < 1e-4
    assert not np.allclose(H0, H1)


# ---------------------------------------------------------------- delays
def test_delay_integer_shifts_impulse():
    d = dsp.parallelDelay(size=(2,), max_len=64, isint=True, nfft=NFFT)
    d = d.assign_value(d.sample2s(jnp.asarray([5.0, 9.0])))
    imp = jnp.zeros((1, NFFT, 2)).at[:, 0, :].set(1.0)
    X = jnp.fft.rfft(imp, n=NFFT, axis=1)
    y = np.asarray(jnp.fft.irfft(d(X), n=NFFT, axis=1))[0]
    assert np.argmax(y[:, 0]) == 5
    assert np.argmax(y[:, 1]) == 9
    assert np.abs(y[:, 0]).sum() == pytest.approx(1.0, abs=1e-4)


def test_delay_mimo_and_probe():
    d = dsp.Delay(size=(2, 2), max_len=32, isint=True, nfft=NFFT)
    H = d.response()
    assert H.shape == (M, 2, 2)
    m = np.asarray(d.get_delays(d.param))
    P = np.asarray(d.probe(jnp.exp(1j * jnp.pi * 0.25)))
    z = np.exp(1j * np.pi * 0.25)
    assert np.allclose(P, z ** (-m), atol=1e-4)


def test_trainable_delay_softplus_map():
    d = dsp.parallelDelay(size=(2,), max_len=32, nfft=NFFT,
                          requires_grad=True)
    assert d.trainable
    # map must be softplus
    v = jnp.asarray([-1.0, 2.0])
    assert np.allclose(np.asarray(d.map(v)), np.asarray(jax.nn.softplus(v)))


def test_gain_delay_fused():
    gd = dsp.GainDelay(size=(2, 2), max_len=16, isint=True, nfft=NFFT)
    H = gd.response()
    gain = np.asarray(gd.param[0])
    delays = np.round(np.asarray(gd.s2sample(gd.param[1])))
    w = 2 * np.pi * np.arange(M) / NFFT
    ref = gain[None] * np.exp(-1j * w[:, None, None] * delays[None])
    assert np.abs(np.asarray(H) - ref).max() < 1e-4


# ---------------------------------------------------------------- IIR
def test_biquad_vs_scipy():
    flamo_tpu.set_seed(5)
    bq = dsp.Biquad(size=(1, 1), n_sections=2, filter_type="lowpass",
                    nfft=NFFT, fs=48000)
    mapped = np.asarray(bq.map(bq.param))
    H = np.asarray(bq.response())[:, 0, 0]
    # rebuild with scipy freqz on the same grid
    from flamo_tpu.functional import lowpass_filter, rad2hertz

    grid = np.fft.rfftfreq(NFFT) * 2 * np.pi
    h_ref = np.ones(M, dtype=complex)
    for k in range(2):
        fc = float(rad2hertz(mapped[k, 0, 0, 0] * np.pi, 48000))
        g = float(mapped[k, 1, 0, 0])
        b, a = lowpass_filter(fc=jnp.asarray(fc), gain=g, fs=48000)
        _, h = sps.freqz(np.asarray(b), np.asarray(a), worN=grid)
        h_ref = h_ref * h
    assert np.abs(H - h_ref).max() / np.abs(h_ref).max() < 1e-3


def test_sos_filter_identity_init():
    s = dsp.SOSFilter(size=(2, 2), n_sections=3, nfft=NFFT)
    H = np.asarray(s.response())
    # identity sections but full (N_out, N_in) matrix of identity responses
    assert np.allclose(H, np.ones_like(H), atol=1e-5)
    assert not s.trainable


def test_parallel_sos_vs_scipy():
    s = dsp.parallelSOSFilter(size=(1,), n_sections=2, nfft=NFFT, fs=48000)
    sos_np = np.zeros((2, 6))
    sos_np[:, :3] = np.random.randn(2, 3) * 0.1
    sos_np[:, 0] += 1.0
    sos_np[:, 3] = 1.0
    sos_np[:, 4:] = np.random.randn(2, 2) * 0.1
    s = s.assign_value(jnp.asarray(sos_np)[:, :, None])
    H = np.asarray(s.response())[:, 0]
    grid = np.fft.rfftfreq(NFFT) * 2 * np.pi
    _, h_ref = sps.sosfreqz(sos_np, worN=grid)
    assert np.abs(H - h_ref).max() < 1e-3


def test_svf_stability_and_shapes():
    for ft in ["lowpass", "highpass", "bandpass", "lowshelf", "highshelf",
               "peaking", "notch", None]:
        sv = dsp.SVF(size=(2, 2), n_sections=2, filter_type=ft, nfft=NFFT)
        H = np.asarray(sv.response())
        assert H.shape == (M, 2, 2)
        assert np.isfinite(H).all(), ft
        # stability by construction: bounded response
        assert np.abs(H).max() < 1e6, ft


def test_geq_flat_at_zero_db():
    g = dsp.GEQ(size=(1, 1), octave_interval=1, nfft=NFFT, fs=48000)
    g = g.assign_value(jnp.ones_like(g.param))  # 0 dB commands
    H = np.asarray(g.response())[:, 0, 0]
    assert np.abs(np.abs(H) - 1.0).max() < 1e-2


def test_parallel_geq_channels_independent():
    g = dsp.parallelGEQ(size=(2,), octave_interval=1, nfft=NFFT, fs=48000)
    H = np.asarray(g.response())
    assert H.shape == (M, 2)
    assert np.isfinite(H).all()


def test_peq_shapes_and_finite():
    for design in ["biquad", "svf"]:
        p = dsp.PEQ(size=(1, 1), n_bands=5, nfft=NFFT, fs=48000,
                    design=design)
        H = np.asarray(p.response())
        assert H.shape == (M, 1, 1)
        assert np.isfinite(H).all(), design
        pp = dsp.parallelPEQ(size=(2,), n_bands=5, nfft=NFFT, fs=48000,
                             design=design)
        Hp = np.asarray(pp.response())
        assert Hp.shape == (M, 2)
        assert np.isfinite(Hp).all(), design


def test_accurate_geq_matches_targets():
    flamo_tpu.set_seed(11)
    g = dsp.parallelAccurateGEQ(size=(1,), octave_interval=1, nfft=1 << 14,
                                fs=48000)
    target_db = np.asarray(g.map(g.param))[:, 0]
    H = np.asarray(g.response())[:, 0]
    f = np.fft.rfftfreq(1 << 14, 1 / 48000)
    mag_db = 20 * np.log10(np.abs(H))
    # at each center frequency the response should be close to the target
    for cf, t in zip(g.center_freq, target_db[1:-1]):
        idx = np.argmin(np.abs(f - cf))
        assert abs(mag_db[idx] - t) < 1.5, (cf, t, mag_db[idx])


# ---------------------------------------------------------------- transforms
def test_fft_ifft_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, NFFT, 3))
    F = dsp.FFT(NFFT)
    iF = dsp.iFFT(NFFT)
    y = iF(F(x))
    assert np.abs(np.asarray(y - x)).max() < 1e-5


def test_fft_antialias_envelope_semantics():
    # both transforms apply the gamma^{-n} envelope, exactly like the
    # reference (dsp.py:158-162 and 201-205) — they do NOT round-trip.
    x = jax.random.normal(jax.random.PRNGKey(0), (1, NFFT, 2))
    gamma = 10 ** (-30 / NFFT / 20)
    env = gamma ** np.arange(0, -NFFT, -1)
    F = dsp.FFTAntiAlias(NFFT, alias_decay_db=30)
    Y = np.asarray(F(x))
    ref = np.fft.rfft(np.asarray(x) * env[None, :, None], axis=1)
    assert np.abs(Y - ref).max() < 1e-2
    iF = dsp.iFFTAntiAlias(NFFT, alias_decay_db=30)
    X = jnp.fft.rfft(x, axis=1)
    y = np.asarray(iF(X))
    ref_t = np.fft.irfft(np.asarray(X), n=NFFT, axis=1) * env[None, :, None]
    assert np.abs(y - ref_t).max() < 1e-4


def test_transform_probe_none():
    t = dsp.Transform(lambda x: x ** 2)
    assert t.probe(1.0) is None
    assert np.allclose(np.asarray(t(jnp.asarray([1.0, 2.0, 3.0]))),
                       [1.0, 4.0, 9.0])


# ---------------------------------------------------------------- scattering
def test_scattering_matrix_paraunitary():
    N = 4
    sm = dsp.ScatteringMatrix(size=(3, N, N), nfft=NFFT, gain_per_sample=1.0,
                              sparsity=2)
    ir = np.asarray(sm.ir(sm.param))  # (T, N, N)
    # paraunitary: sum_t V_t^T V_{t+k} = I delta_k  (lossless with gain 1)
    T = ir.shape[0]
    gram = np.zeros((N, N))
    for t in range(T):
        gram += ir[t].T @ ir[t]
    assert np.abs(gram - np.eye(N)).max() < 1e-4


def test_velvet_noise_matrix_nonlearnable():
    N = 4
    vm = dsp.VelvetNoiseMatrix(size=(2, N, N), nfft=NFFT, density=0.1)
    assert not vm.trainable
    H = np.asarray(vm.response())
    assert H.shape == (M, N, N)
    assert np.isfinite(H).all()


# ---------------------------------------------------------------- functional updates
def test_assign_value_functional():
    g = dsp.Gain(size=(2, 2), nfft=NFFT)
    g2 = g.assign_value(jnp.eye(2))
    assert np.allclose(np.asarray(g2.param), np.eye(2))
    assert not np.allclose(np.asarray(g.param), np.eye(2))
    with pytest.raises(AssertionError):
        g.assign_value(jnp.ones((3, 3)))


def test_module_is_pytree():
    g = dsp.Gain(size=(2, 2), nfft=NFFT, requires_grad=True)
    leaves, treedef = jax.tree_util.tree_flatten(g)
    assert len(leaves) == 1
    g2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(g2, dsp.Gain)
    assert g2.nfft == NFFT and g2.trainable


# ---------------------------------------------------------------- response_at
def test_response_at_matches_gathered_response():
    """response_at(bins) == response()[bins] across the protocol:
    Filter/ScatteringMatrix (exact-phase DFT contraction), Delay /
    parallelDelay (closed-form phasor incl. trainable non-integer
    delays), Gain (frequency-flat), and the DSP-base gather fallback
    (SVF has no override)."""
    flamo_tpu.set_seed(11)
    bins = jnp.asarray([0, 1, 7, 100, 311, M - 1])

    f = dsp.Filter(size=(48, 3, 2), nfft=NFFT, requires_grad=True,
                   alias_decay_db=20.0)
    np.testing.assert_allclose(np.asarray(f.response_at(bins)),
                               np.asarray(f.response()[bins]),
                               rtol=2e-4, atol=2e-5)

    s = dsp.ScatteringMatrix(size=(3, 4, 4), nfft=NFFT, sparsity=2,
                             m_L=np.array([3, 5, 2, 7]),
                             m_R=np.array([2, 4, 6, 3]),
                             alias_decay_db=30.0)
    np.testing.assert_allclose(np.asarray(s.response_at(bins)),
                               np.asarray(s.response()[bins]),
                               rtol=2e-4, atol=2e-5)

    d = dsp.parallelDelay(size=(4,), max_len=200, nfft=NFFT, isint=True,
                          alias_decay_db=30.0)
    # f32 phase-rounding order differs (2pi/nfft * (b*m mod nfft) vs
    # (2pi*b/nfft) * m) -> ~1e-5 absolute wiggle on O(1) phasors
    np.testing.assert_allclose(np.asarray(d.response_at(bins)),
                               np.asarray(d.response()[bins]),
                               rtol=1e-4, atol=2e-5)

    dt = dsp.Delay(size=(2, 3), max_len=150, nfft=NFFT,
                   requires_grad=True)  # softplus map -> non-integer
    np.testing.assert_allclose(np.asarray(dt.response_at(bins)),
                               np.asarray(dt.response()[bins]),
                               rtol=1e-4, atol=1e-5)

    g = dsp.Gain(size=(3, 2), nfft=NFFT)
    np.testing.assert_allclose(np.asarray(g.response_at(bins)),
                               np.asarray(g.response()),
                               rtol=1e-6)

    svf = dsp.SVF(size=(1, 1), nfft=NFFT)  # base-class gather fallback
    np.testing.assert_allclose(np.asarray(svf.response_at(bins)),
                               np.asarray(svf.response()[bins]),
                               rtol=1e-6)


def test_response_at_delay_gradient_matches():
    """The trainable-delay phase split (int32 mod + f32 fraction) keeps
    the exact derivative d phase / d m = 2 pi b / nfft: grads through
    response_at match grads through the gathered full response."""
    flamo_tpu.set_seed(12)
    d = dsp.Delay(size=(2, 2), max_len=100, nfft=NFFT, requires_grad=True)
    bins = jnp.asarray([3, 97, 410])

    def loss_at(p):
        return jnp.sum(jnp.abs(d.response_at(bins, ext_param=p)) ** 2) + \
            jnp.sum(d.response_at(bins, ext_param=p).real)

    def loss_full(p):
        r = d.response(ext_param=p)[bins]
        return jnp.sum(jnp.abs(r) ** 2) + jnp.sum(r.real)

    g1 = jax.grad(loss_at)(d.param)
    g2 = jax.grad(loss_full)(d.param)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)
