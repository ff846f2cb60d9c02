"""Loss-function tests: identity/zero properties, scipy STFT oracle,
Schroeder integration, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flamo_tpu.optimize import loss as L


def _sig(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def test_stft_magnitude_matches_scipy():
    import scipy.signal as sps

    x = _sig((1, 4096))
    S = np.asarray(L.stft_magnitude(x, n_fft=512, hop_length=128))
    f, t, Z = sps.stft(np.asarray(x)[0], nperseg=512, noverlap=384,
                       window="hann", boundary="even", padded=False,
                       return_onesided=True)
    # scipy scales by win.sum(); compare shapes and correlation instead of
    # absolute scale
    n = min(S.shape[2], Z.shape[1])
    a = S[0, :, :n].ravel()
    b = np.abs(Z[:, :n]).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99


def test_mel_filterbank_partitions():
    fb = np.asarray(L.mel_filterbank(48000, 1024, 64))
    assert fb.shape == (64, 513)
    assert (fb >= 0).all()
    # every mel filter has some support
    assert (fb.sum(axis=1) > 0).all()


@pytest.mark.parametrize("cls,kwargs", [
    (L.mss_loss, {"nfft": [256, 512]}),
    (L.mel_mss_loss, {"nfft": [256, 512]}),
    (L.edr_loss, {"nfft": 256, "sample_rate": 8000}),
    (L.edc_loss, {"is_broadband": True}),
])
def test_losses_zero_at_identity(cls, kwargs):
    x = _sig((1, 4096, 1))
    loss = cls(**kwargs)
    v = float(loss(x, x))
    assert v == pytest.approx(0.0, abs=1e-4), cls.__name__


def test_mss_losses_jittable():
    """The perceptual losses must trace under jit — the Trainer always
    jits its step.  Regression: the respaced-grid stft_magnitude built
    its DFT kernel from a jnp window via np.asarray, which raised
    TracerArrayConversionError on every JITTED mss call (broke e8_fdn,
    2026-08-19); the window is static and now stays host-side numpy."""
    import jax

    x = _sig((1, 4096, 1), seed=3)
    y = _sig((1, 4096, 1), seed=4)
    for cls, kwargs in [(L.mss_loss, {"nfft": [256, 512]}),
                        (L.mss_loss, {"nfft": [256],
                                      "freq_grid": "rfft"}),
                        (L.mel_mss_loss, {"nfft": [256, 512]})]:
        loss = cls(**kwargs)
        vj = float(jax.jit(lambda a, b: loss(a, b))(x, y))
        ve = float(loss(x, y))
        assert vj == pytest.approx(ve, rel=1e-6), cls.__name__
        g = jax.jit(jax.grad(lambda a: loss(a, y)))(x)
        assert bool(jax.numpy.isfinite(g).all()), cls.__name__


def test_average_power_identity_and_positive():
    # needs >= 64 STFT frames for the 64x64 smoothing window (same
    # constraint as the reference's conv2d, loss.py:528-539)
    x = _sig((1, 20000, 1), seed=11)
    y = _sig((1, 20000, 1), seed=12)
    ap = L.AveragePower()
    assert float(ap(x, x)) == pytest.approx(0.0, abs=1e-5)
    assert float(ap(x, y)) > 0


@pytest.mark.parametrize("cls,kwargs", [
    (L.mss_loss, {"nfft": [256]}),
    (L.mss_loss, {"nfft": [256], "form": "yamamoto"}),
    (L.mss_loss, {"nfft": [256], "form": "magenta"}),
    (L.mel_mss_loss, {"nfft": [256]}),
    (L.edc_loss, {"is_broadband": True}),
])
def test_losses_positive_and_differentiable(cls, kwargs):
    x = _sig((1, 2048, 1), seed=1)
    y = _sig((1, 2048, 1), seed=2)
    loss = cls(**kwargs)
    v = float(loss(x, y))
    assert v > 0

    g = jax.grad(lambda x: loss(x, y))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_edc_subband_runs():
    x = _sig((1, 4096, 1), seed=3)
    y = _sig((1, 4096, 1), seed=4)
    loss = L.edc_loss(is_broadband=False, n_fractions=1, sample_rate=48000)
    v = float(loss(x, y))
    assert np.isfinite(v)


def test_schroeder_backward_int_monotone():
    x = _sig((1, 256, 1), seed=5)
    edc, _ = L.schroeder_backward_int(x, axis=1, energy_norm=True)
    e = np.asarray(edc)[0, :, 0]
    assert (np.diff(e) <= 1e-6).all()  # non-increasing
    assert e[0] == pytest.approx(1.0)


def test_sparsity_loss_extremes():
    """Orthogonal sparse (identity-like) vs dense (hadamard-like)."""
    from collections import OrderedDict
    from flamo_tpu.processor import dsp, system

    N, nfft = 4, 256
    dl = dsp.parallelDelay(size=(N,), max_len=16, isint=True, nfft=nfft)
    ig = dsp.Gain(size=(N, 1), nfft=nfft)
    og = dsp.Gain(size=(1, N), nfft=nfft)

    def model_with(matrix_raw):
        fb = dsp.Matrix(size=(N, N), nfft=nfft).assign_value(matrix_raw)
        core = system.Series(OrderedDict({
            "input_gain": ig,
            "feedback_loop": system.Recursion(fF=dl, fB=fb),
            "output_gain": og}))
        return system.Shell(core=core)

    sl = L.sparsity_loss()
    # identity (maximally sparse orthogonal) vs scaled hadamard (dense)
    m_id = model_with(jnp.eye(N))
    from flamo_tpu.functional import hadamard_matrix_jnp

    m_hd = model_with(hadamard_matrix_jnp(N))
    v_id = float(sl(None, None, m_id))
    v_hd = float(sl(None, None, m_hd))
    # -(sum|A| - N sqrt N)/(N (sqrt N - 1)): hadamard (dense, sum=N sqrt N)
    # scores 0, identity (sparse, sum=N) scores +1 — minimizing drives the
    # matrix dense (arXiv:2402.11216)
    assert v_hd < v_id
    assert v_hd == pytest.approx(0.0, abs=1e-5)
    assert v_id == pytest.approx(1.0, abs=1e-5)


def test_mse_loss_multi_channel_target_no_squeeze():
    """torch.squeeze(y_true, dim=-1) is a silent no-op when the last dim
    is not 1 (reference loss.py:66-103); the jnp version must not raise.
    With matching pred/target shapes the channel-summed pred broadcasts
    against the unsqueezed target exactly as in torch."""
    mse = L.mse_loss()
    # unit last dim: squeezed, classic channel-sum semantics
    y = jnp.ones((2, 8, 1))
    t = jnp.zeros((2, 8, 1))
    assert float(mse(y, t)) == pytest.approx(1.0)
    # non-unit last dim: target stays (B, M, C); sum over pred channels
    # broadcasts against it (torch semantics, verified vs the reference)
    y2 = jnp.ones((2, 8, 1, 3))
    t2 = jnp.zeros((2, 8, 3))
    assert float(mse(y2, t2)) == pytest.approx(9.0)  # torch gives 9.0 too


def test_masked_mse_state_passing():
    loss = L.masked_mse_loss(nfft=128, n_samples=13, n_sets=2)
    y = jnp.ones((1, 65, 1))[..., 0]
    t = jnp.zeros((1, 65, 1))[..., 0]
    v0 = float(loss(y, t, step=jnp.asarray(0), state=loss.mask_indices))
    assert v0 == pytest.approx(1.0)
    loss.pre_step()
    assert loss._calls == 1


def test_mse_evs_matches_manual_eig():
    """mse_evs == mean((|eig| - target)^2) over the selected partition, and
    its gradient is finite and nonzero (differentiable-eig path)."""
    import jax
    import jax.numpy as jnp
    from flamo_tpu.optimize.loss import mse_evs

    M, N = 65, 3
    rng = np.random.default_rng(3)
    y = (rng.standard_normal((1, M, N, N))
         + 1j * rng.standard_normal((1, M, N, N))).astype(np.complex64)
    t = np.ones((1, M, N), dtype=np.float32)
    crit = mse_evs(iter_num=4, freq_points=M)
    idx = np.asarray(crit.mask_indices[1])
    got = float(crit(jnp.asarray(y), jnp.asarray(t), step=1,
                     state=crit.mask_indices))
    evs = np.abs(np.linalg.eigvals(y[:, idx]))
    want = float(np.mean((np.sort(evs, -1) - 1.0) ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    g = jax.grad(lambda yy: crit(yy, jnp.asarray(t), step=1,
                                 state=crit.mask_indices))(jnp.asarray(y))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_mss_zero_noise_energy_falsy():
    """A user-supplied noise_energy=0.0 must behave like None (estimate
    from the target) — the reference's falsy check; a literal 0.0 would
    feed log10(0) into the SNR mask (ADVICE r4)."""
    import jax.numpy as jnp
    import flamo_tpu.optimize.loss as L

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((1, 2048, 1)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((1, 2048, 1)).astype(np.float32))
    crit0 = L.mss_loss(nfft=[256], apply_mask=True, noise_energy=0.0)
    critn = L.mss_loss(nfft=[256], apply_mask=True, noise_energy=None)
    v0 = float(crit0(y, t))
    vn = float(critn(y, t))
    assert np.isfinite(v0)
    assert v0 == vn
