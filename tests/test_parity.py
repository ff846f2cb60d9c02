"""Numerical parity vs the mounted PyTorch reference (BASELINE.md parity
gate: responses match within float32 tolerance).

The reference is imported directly from /root/reference with lightweight
stubs for its unavailable optional deps (soundfile, nnAudio, pyfar — none
of which are on the compared code paths)."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    # stub optional deps the compared paths never touch
    for name in ["soundfile", "pyfar"]:
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.write = lambda *a, **k: None
            stub.read = lambda *a, **k: (None, None)
            sys.modules[name] = stub
    if "nnAudio" not in sys.modules:
        nn_audio = types.ModuleType("nnAudio")
        features = types.ModuleType("nnAudio.features")
        features.mel = types.SimpleNamespace(MelSpectrogram=None)
        features.stft = types.SimpleNamespace(STFT=None)
        nn_audio.features = features
        sys.modules["nnAudio"] = nn_audio
        sys.modules["nnAudio.features"] = features
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import flamo.functional as rfunc
    import flamo.processor.dsp as rdsp
    import flamo.processor.system as rsys

    return types.SimpleNamespace(func=rfunc, dsp=rdsp, sys=rsys)


NFFT = 2048
FS = 48000


def _close(a, b, atol=1e-4, rtol=1e-3):
    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape, (a.shape, b.shape)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol)


# ------------------------------------------------------------ functional
def test_parity_rbj_filters(ref):
    import jax.numpy as jnp
    from flamo_tpu import functional as F

    for fc, fn_j, fn_t in [
        (500.0, F.lowpass_filter, ref.func.lowpass_filter),
        (8000.0, F.highpass_filter, ref.func.highpass_filter),
    ]:
        bj, aj = fn_j(fc=jnp.asarray(fc), gain=3.0, fs=FS)
        bt, at = fn_t(fc=torch.tensor(fc), gain=torch.tensor(3.0), fs=FS)
        _close(bj, bt.numpy())
        _close(aj, at.numpy())

    bj, aj = F.bandpass_filter(jnp.asarray(500.0), jnp.asarray(4000.0),
                               2.0, fs=FS)
    bt, at = ref.func.bandpass_filter(torch.tensor(500.0),
                                      torch.tensor(4000.0),
                                      torch.tensor(2.0), fs=FS)
    _close(bj, bt.numpy())
    _close(aj, at.numpy())


def test_parity_shelving_peak(ref):
    import jax.numpy as jnp
    from flamo_tpu import functional as F

    for t in ["low", "high"]:
        bj, aj = F.shelving_filter(jnp.asarray(1000.0), jnp.asarray(2.0), t,
                                   fs=FS)
        bt, at = ref.func.shelving_filter(torch.tensor(1000.0),
                                          torch.tensor(2.0), t, fs=FS)
        _close(bj, bt.numpy())
        _close(aj, at.numpy())

    bj, aj = F.peak_filter(jnp.asarray(2000.0), jnp.asarray(2.0),
                           jnp.asarray(3.0), fs=FS)
    bt, at = ref.func.peak_filter(torch.tensor(2000.0), torch.tensor(2.0),
                                  torch.tensor(3.0), fs=FS)
    _close(bj, bt.numpy())
    _close(aj, at.numpy())


def test_parity_prop_filters(ref):
    import jax.numpy as jnp
    from flamo_tpu import functional as F

    bj, aj = F.prop_shelving_filter(jnp.asarray(1000.0), jnp.asarray(6.0),
                                    "low", fs=FS)
    bt, at = ref.func.prop_shelving_filter(torch.tensor(1000.0),
                                           torch.tensor(6.0), "low", fs=FS)
    _close(bj, bt.numpy())
    _close(aj, at.numpy())

    bj, aj = F.prop_peak_filter(jnp.asarray(1000.0), jnp.asarray(200.0),
                                jnp.asarray(4.0), fs=FS)
    bt, at = ref.func.prop_peak_filter(torch.tensor(1000.0),
                                       torch.tensor(200.0),
                                       torch.tensor(4.0), fs=FS)
    _close(bj, bt.numpy())
    _close(aj, at.numpy())


def test_parity_svf_functional(ref):
    import jax.numpy as jnp
    from flamo_tpu import functional as F

    for ft in ["lowpass", "highpass", "bandpass", "lowshelf", "highshelf",
               "peaking"]:
        bj, aj = F.svf(jnp.asarray(1000.0), jnp.asarray(0.9),
                       G=jnp.asarray(0.5), filter_type=ft, fs=FS)
        bt, at = ref.func.svf(torch.tensor(1000.0), torch.tensor(0.9),
                              G=torch.tensor(0.5), filter_type=ft, fs=FS)
        _close(bj, bt.numpy(), atol=1e-4)
        _close(aj, at.numpy(), atol=1e-4)


def test_parity_skew_and_orthogonal_map(ref):
    import jax.numpy as jnp
    from flamo_tpu import functional as F

    x = np.random.default_rng(0).normal(size=(6, 6)).astype(np.float32)
    _close(F.skew_matrix(jnp.asarray(x)),
           ref.func.skew_matrix(torch.tensor(x)).numpy(), atol=1e-6)
    Uj = F.expm_skew(jnp.asarray(x))
    Ut = torch.matrix_exp(ref.func.skew_matrix(torch.tensor(x))).numpy()
    _close(Uj, Ut, atol=2e-5)


def test_parity_biquad2tf(ref):
    import jax.numpy as jnp
    from flamo_tpu import functional as F

    rng = np.random.default_rng(1)
    b = rng.normal(size=(3, 2)).astype(np.float32)
    a = rng.normal(size=(3, 2)).astype(np.float32)
    a[0] += 3  # keep away from zeros
    Hj = F.biquad2tf(jnp.asarray(b), jnp.asarray(a), NFFT)
    Ht = ref.func.biquad2tf(torch.tensor(b), torch.tensor(a), NFFT).numpy()
    _close(Hj, Ht, atol=1e-3)


# ------------------------------------------------------------ dsp modules
def test_parity_gain_forward(ref):
    import jax.numpy as jnp
    import flamo_tpu
    from flamo_tpu.processor import dsp

    rng = np.random.default_rng(2)
    W = rng.normal(size=(3, 2)).astype(np.float32)
    X = (rng.normal(size=(1, NFFT // 2 + 1, 2))
         + 1j * rng.normal(size=(1, NFFT // 2 + 1, 2))).astype(np.complex64)

    gj = dsp.Gain(size=(3, 2), nfft=NFFT).assign_value(jnp.asarray(W))
    yj = gj(jnp.asarray(X))

    gt = ref.dsp.Gain(size=(3, 2), nfft=NFFT)
    gt.assign_value(torch.tensor(W))
    yt = gt(torch.tensor(X)).numpy()
    _close(yj, yt, atol=1e-5)


def test_parity_delay_response(ref):
    import jax.numpy as jnp
    from flamo_tpu.processor import dsp

    delays = np.array([13.0, 29.0, 47.0], dtype=np.float32)
    dj = dsp.parallelDelay(size=(3,), max_len=64, isint=True, nfft=NFFT,
                           alias_decay_db=30)
    dj = dj.assign_value(dj.sample2s(jnp.asarray(delays)))
    Hj = dj.response()

    dt = ref.dsp.parallelDelay(size=(3,), max_len=64, isint=True, nfft=NFFT,
                               alias_decay_db=30)
    dt.assign_value(dt.sample2s(torch.tensor(delays)))
    Ht = dt.freq_response(dt.param).detach().numpy()
    _close(Hj, Ht, atol=1e-4)


def test_parity_biquad_response(ref):
    import jax.numpy as jnp
    import flamo_tpu
    from flamo_tpu.processor import dsp

    rng = np.random.default_rng(3)
    raw = np.stack([rng.uniform(0.05, 0.5, (2, 1, 1)),
                    rng.uniform(0.2, 1.0, (2, 1, 1))],
                   axis=1).astype(np.float32)  # (K,2,1,1)

    bj = dsp.Biquad(size=(1, 1), n_sections=2, filter_type="lowpass",
                    nfft=NFFT, fs=FS, alias_decay_db=20)
    bj = bj.assign_value(jnp.asarray(raw))
    Hj = bj.response()

    bt = ref.dsp.Biquad(size=(1, 1), n_sections=2, filter_type="lowpass",
                        nfft=NFFT, fs=FS, alias_decay_db=20)
    bt.assign_value(torch.tensor(raw))
    Ht = bt.freq_response(bt.param).detach().numpy()
    _close(Hj, Ht, atol=1e-3, rtol=1e-2)


def test_parity_svf_module(ref):
    import jax.numpy as jnp
    from flamo_tpu.processor import dsp

    rng = np.random.default_rng(4)
    raw = rng.normal(size=(5, 2, 1, 1)).astype(np.float32)

    sj = dsp.SVF(size=(1, 1), n_sections=2, filter_type="peaking",
                 nfft=NFFT, fs=FS)
    sj = sj.assign_value(jnp.asarray(raw))
    Hj = sj.response()

    st = ref.dsp.SVF(size=(1, 1), n_sections=2, filter_type="peaking",
                     nfft=NFFT, fs=FS)
    st.assign_value(torch.tensor(raw))
    Ht = st.freq_response(st.param).detach().numpy()
    _close(Hj, Ht, atol=1e-3, rtol=1e-2)


def test_parity_filter_fir(ref):
    import jax.numpy as jnp
    from flamo_tpu.processor import dsp

    rng = np.random.default_rng(5)
    taps = rng.normal(size=(16, 2, 3)).astype(np.float32)

    fj = dsp.Filter(size=(16, 2, 3), nfft=NFFT, alias_decay_db=10)
    fj = fj.assign_value(jnp.asarray(taps))
    Hj = fj.response()

    ft = ref.dsp.Filter(size=(16, 2, 3), nfft=NFFT, alias_decay_db=10)
    ft.assign_value(torch.tensor(taps))
    Ht = ft.freq_response(ft.param).detach().numpy()
    _close(Hj, Ht, atol=1e-4)


def test_parity_fdn_closed_loop(ref):
    """Full closed-loop FDN forward parity (the BASELINE workload shape,
    scaled down)."""
    import jax.numpy as jnp
    from collections import OrderedDict
    from flamo_tpu.processor import dsp, system

    rng = np.random.default_rng(6)
    N = 4
    delays = np.array([89.0, 97.0, 107.0, 113.0], dtype=np.float32)
    Wmix = rng.normal(size=(N, N)).astype(np.float32)
    gin = rng.normal(size=(N, 1)).astype(np.float32)
    gout = rng.normal(size=(1, N)).astype(np.float32)
    alias = 30.0

    # jax model
    dj = dsp.parallelDelay(size=(N,), max_len=128, isint=True, nfft=NFFT,
                           alias_decay_db=alias)
    dj = dj.assign_value(dj.sample2s(jnp.asarray(delays)))
    mj = dsp.Matrix(size=(N, N), nfft=NFFT, matrix_type="orthogonal",
                    alias_decay_db=alias).assign_value(jnp.asarray(Wmix))
    igj = dsp.Gain(size=(N, 1), nfft=NFFT, alias_decay_db=alias) \
        .assign_value(jnp.asarray(gin))
    ogj = dsp.Gain(size=(1, N), nfft=NFFT, alias_decay_db=alias) \
        .assign_value(jnp.asarray(gout))
    corej = system.Series(OrderedDict({
        "i": igj, "l": system.Recursion(fF=dj, fB=mj), "o": ogj}))

    # torch model
    dt = ref.dsp.parallelDelay(size=(N,), max_len=128, isint=True,
                               nfft=NFFT, alias_decay_db=alias)
    dt.assign_value(dt.sample2s(torch.tensor(delays)))
    mt = ref.dsp.Matrix(size=(N, N), nfft=NFFT, matrix_type="orthogonal",
                        alias_decay_db=alias)
    mt.assign_value(torch.tensor(Wmix))
    igt = ref.dsp.Gain(size=(N, 1), nfft=NFFT, alias_decay_db=alias)
    igt.assign_value(torch.tensor(gin))
    ogt = ref.dsp.Gain(size=(1, N), nfft=NFFT, alias_decay_db=alias)
    ogt.assign_value(torch.tensor(gout))
    from collections import OrderedDict as OD
    coret = ref.sys.Series(OD({
        "i": igt,
        "l": ref.sys.Recursion(fF=dt, fB=mt),
        "o": ogt}))

    M = NFFT // 2 + 1
    X = (rng.normal(size=(1, M, 1))
         + 1j * rng.normal(size=(1, M, 1))).astype(np.complex64)
    yj = np.asarray(corej(jnp.asarray(X)))
    yt = coret(torch.tensor(X)).detach().numpy()
    _close(yj, yt, atol=2e-3, rtol=1e-2)


def test_parity_alias_envelopes(ref):
    """gamma formula and FFT/iFFT anti-alias envelopes match."""
    import jax.numpy as jnp
    from flamo_tpu.processor import dsp

    x = np.random.default_rng(7).normal(size=(1, NFFT, 2)).astype(np.float32)
    fj = dsp.FFTAntiAlias(NFFT, alias_decay_db=30)
    ft = ref.dsp.FFTAntiAlias(NFFT, alias_decay_db=30)
    _close(fj(jnp.asarray(x)), ft(torch.tensor(x)).numpy(), atol=2e-2,
           rtol=1e-3)

    X = np.fft.rfft(x, axis=1).astype(np.complex64)
    ij = dsp.iFFTAntiAlias(NFFT, alias_decay_db=30)
    it = ref.dsp.iFFTAntiAlias(NFFT, alias_decay_db=30)
    _close(ij(jnp.asarray(X)), it(torch.tensor(X)).numpy(), atol=1e-3)


def test_parity_geq_design(ref):
    """GEQ SOS design parity: flamo_tpu geq vs reference geq."""
    import jax.numpy as jnp
    from flamo_tpu.auxiliary.eq import eq_freqs, geq

    center, shelving = eq_freqs(interval=1)
    K = len(np.asarray(center)) + 3
    gains = np.linspace(-5, 5, K).astype(np.float32)

    bj, aj = geq(center, shelving, 2.7, jnp.asarray(gains), fs=FS)

    from flamo.auxiliary.eq import geq as rgeq

    bt, at = rgeq(torch.tensor(np.asarray(center)),
                  torch.tensor(np.asarray(shelving)),
                  torch.tensor(2.7), torch.tensor(gains), fs=FS)
    _close(bj, bt.numpy(), atol=1e-4)
    _close(aj, at.numpy(), atol=1e-4)


def test_parity_householder_forward(ref):
    import jax.numpy as jnp
    from flamo_tpu.processor import dsp

    rng = np.random.default_rng(8)
    u_raw = rng.normal(size=(4, 1)).astype(np.float32)
    X = (rng.normal(size=(1, NFFT // 2 + 1, 4))
         + 1j * rng.normal(size=(1, NFFT // 2 + 1, 4))).astype(np.complex64)

    hj = dsp.HouseholderMatrix(size=(4, 4), nfft=NFFT)
    hj = hj.assign_value(jnp.asarray(u_raw))
    yj = hj(jnp.asarray(X))

    ht = ref.dsp.HouseholderMatrix(size=(4, 4), nfft=NFFT)
    ht.assign_value(torch.tensor(u_raw))
    yt = ht(torch.tensor(X)).detach().numpy()
    _close(yj, yt, atol=1e-4)


def test_parity_gain_delay(ref):
    import jax.numpy as jnp
    from flamo_tpu.processor import dsp

    rng = np.random.default_rng(9)
    raw = np.stack([rng.normal(size=(2, 3)),
                    np.abs(rng.normal(size=(2, 3))) * 0.01]).astype(np.float32)

    gj = dsp.GainDelay(size=(2, 3), max_len=64, isint=True, nfft=NFFT,
                       fs=FS, alias_decay_db=10)
    gj = gj.assign_value(jnp.asarray(raw))
    Hj = gj.response()

    gt = ref.dsp.GainDelay(size=(2, 3), max_len=64, isint=True, nfft=NFFT,
                           fs=FS, alias_decay_db=10)
    gt.assign_value(torch.tensor(raw))
    Ht = gt.freq_response(gt.param).detach().numpy()
    _close(Hj, Ht, atol=1e-4)


def test_parity_sos_filter(ref):
    import jax.numpy as jnp
    from flamo_tpu.processor import dsp

    rng = np.random.default_rng(10)
    sos = np.zeros((2, 6, 1, 1), dtype=np.float32)
    sos[:, 0] = 1.0 + 0.1 * rng.normal(size=(2, 1, 1))
    sos[:, 1:3] = 0.1 * rng.normal(size=(2, 2, 1, 1))
    sos[:, 3] = 1.0
    sos[:, 4:6] = 0.1 * rng.normal(size=(2, 2, 1, 1))

    sj = dsp.SOSFilter(size=(1, 1), n_sections=2, nfft=NFFT, fs=FS,
                       alias_decay_db=15)
    sj = sj.assign_value(jnp.asarray(sos))
    Hj = sj.response()

    st = ref.dsp.SOSFilter(size=(1, 1), n_sections=2, nfft=NFFT, fs=FS,
                           alias_decay_db=15)
    st.assign_value(torch.tensor(sos))
    Ht = st.freq_response(st.param).detach().numpy()
    _close(Hj, Ht, atol=1e-3, rtol=1e-2)


def test_parity_parallel_svf(ref):
    import jax.numpy as jnp
    from flamo_tpu.processor import dsp

    rng = np.random.default_rng(11)
    raw = rng.normal(size=(5, 1, 3)).astype(np.float32)

    sj = dsp.parallelSVF(size=(3,), n_sections=1, filter_type="lowshelf",
                         nfft=NFFT, fs=FS)
    sj = sj.assign_value(jnp.asarray(raw))
    Hj = sj.response()

    st = ref.dsp.parallelSVF(size=(3,), n_sections=1, filter_type="lowshelf",
                             nfft=NFFT, fs=FS)
    st.assign_value(torch.tensor(raw))
    Ht = st.freq_response(st.param).detach().numpy()
    _close(Hj, Ht, atol=1e-3, rtol=1e-2)


def test_parity_parallel_system(ref):
    """system.Parallel sum/concat forward parity."""
    import jax.numpy as jnp
    from collections import OrderedDict as OD
    from flamo_tpu.processor import dsp, system

    rng = np.random.default_rng(12)
    Wa = rng.normal(size=(3, 2)).astype(np.float32)
    Wb = rng.normal(size=(3, 2)).astype(np.float32)
    X = (rng.normal(size=(1, NFFT // 2 + 1, 2))
         + 1j * rng.normal(size=(1, NFFT // 2 + 1, 2))).astype(np.complex64)

    for sum_output in [True, False]:
        pj = system.Parallel(
            dsp.Gain(size=(3, 2), nfft=NFFT).assign_value(jnp.asarray(Wa)),
            dsp.Gain(size=(3, 2), nfft=NFFT).assign_value(jnp.asarray(Wb)),
            sum_output=sum_output)
        yj = pj(jnp.asarray(X))

        ga = ref.dsp.Gain(size=(3, 2), nfft=NFFT)
        ga.assign_value(torch.tensor(Wa))
        gb = ref.dsp.Gain(size=(3, 2), nfft=NFFT)
        gb.assign_value(torch.tensor(Wb))
        pt = ref.sys.Parallel(ga, gb, sum_output=sum_output)
        yt = pt(torch.tensor(X)).detach().numpy()
        _close(yj, yt, atol=1e-5)


def test_parity_shell_time_response(ref):
    """Shell.get_time_response with the alias-undo envelope."""
    import jax.numpy as jnp
    from collections import OrderedDict as OD
    from flamo_tpu.processor import dsp, system

    rng = np.random.default_rng(13)
    taps = rng.normal(size=(16, 1, 1)).astype(np.float32)
    alias = 20.0

    fj = dsp.Filter(size=(16, 1, 1), nfft=NFFT, alias_decay_db=alias)
    fj = fj.assign_value(jnp.asarray(taps))
    mj = system.Shell(core=fj, input_layer=dsp.FFT(NFFT),
                      output_layer=dsp.iFFT(NFFT))
    irj = np.asarray(mj.get_time_response(fs=FS))

    ft = ref.dsp.Filter(size=(16, 1, 1), nfft=NFFT, alias_decay_db=alias)
    ft.assign_value(torch.tensor(taps))
    mt = ref.sys.Shell(core=ft, input_layer=ref.dsp.FFT(NFFT),
                       output_layer=ref.dsp.iFFT(NFFT))
    irt = mt.get_time_response(fs=FS).detach().numpy()
    _close(irj, irt, atol=1e-4)


def test_parity_training_trajectory(ref):
    """20 Adam steps on the biquad-matching toy from IDENTICAL raw init:
    per-step losses must track the reference closely (BASELINE.md
    'final-MSE parity')."""
    import jax
    import jax.numpy as jnp
    import optax
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.core import trainable_mask

    rng = np.random.default_rng(21)
    raw0 = np.stack([rng.uniform(0.1, 0.4, (2, 1, 1)),
                     rng.uniform(0.3, 0.9, (2, 1, 1))],
                    axis=1).astype(np.float32)
    M = NFFT // 2 + 1
    target = np.abs(rng.normal(size=(1, M, 1))).astype(np.float32)
    x_time = np.zeros((1, NFFT, 1), dtype=np.float32)
    x_time[:, 0, :] = 1.0
    lr = 5e-3

    # --- flamo_tpu ---
    bq = dsp.Biquad(size=(1, 1), n_sections=2, filter_type="highpass",
                    nfft=NFFT, fs=FS, requires_grad=True)
    bq = bq.assign_value(jnp.asarray(raw0))
    model = system.Shell(core=bq, input_layer=dsp.FFT(NFFT),
                         output_layer=dsp.Transform(lambda z: jnp.abs(z)))
    tx = optax.adam(lr)
    mask = trainable_mask(model)
    opt_state = tx.init(model)
    xj = jnp.asarray(x_time)
    tj = jnp.asarray(target)

    def loss_fn(m):
        return jnp.mean((m(xj) - tj) ** 2)

    @jax.jit
    def step(m, o):
        loss, g = jax.value_and_grad(loss_fn)(m)
        g = jax.tree_util.tree_map(
            lambda gr, msk: gr if msk else jnp.zeros_like(gr), g, mask)
        u, o = tx.update(g, o, m)
        return optax.apply_updates(m, u), o, loss

    losses_j = []
    m, o = model, opt_state
    for _ in range(20):
        m, o, l = step(m, o)
        losses_j.append(float(l))

    # --- reference ---
    bt = ref.dsp.Biquad(size=(1, 1), n_sections=2, filter_type="highpass",
                        nfft=NFFT, fs=FS, requires_grad=True)
    bt.assign_value(torch.tensor(raw0))
    mt = ref.sys.Shell(core=bt, input_layer=ref.dsp.FFT(NFFT),
                       output_layer=ref.dsp.Transform(
                           transform=lambda z: torch.abs(z)))
    opt = torch.optim.Adam(mt.parameters(), lr=lr)
    xt = torch.tensor(x_time)
    tt = torch.tensor(target)
    losses_t = []
    for _ in range(20):
        opt.zero_grad()
        loss = torch.mean((mt(xt) - tt) ** 2)
        loss.backward()
        opt.step()
        losses_t.append(float(loss))

    np.testing.assert_allclose(losses_j, losses_t, rtol=1e-3, atol=1e-5)


def test_parity_peq_module(ref):
    import jax.numpy as jnp
    from flamo_tpu.processor import dsp

    rng = np.random.default_rng(22)
    n_bands = 5
    raw = rng.uniform(0.1, 0.9, (n_bands, 3, 1, 1)).astype(np.float32)

    for design in ["biquad", "svf"]:
        pj = dsp.PEQ(size=(1, 1), n_bands=n_bands, design=design,
                     nfft=NFFT, fs=FS)
        pj = pj.assign_value(jnp.asarray(raw))
        Hj = pj.response()

        pt = ref.dsp.PEQ(size=(1, 1), n_bands=n_bands, design=design,
                         nfft=NFFT, fs=FS)
        pt.assign_value(torch.tensor(raw))
        Ht = pt.freq_response(pt.param).detach().numpy()
        _close(Hj, Ht, atol=2e-3, rtol=2e-2)


def test_parity_eigvals_gradient(ref):
    """Gradient of an eigenvalue-magnitude loss through
    flamo_tpu.functional.eigvals matches torch.linalg.eigvals autograd
    (VERDICT round-1 missing #1).  torch stores the conjugate-Wirtinger
    gradient for complex leaves while JAX stores the plain one, hence the
    conj in the comparison."""
    import jax
    import jax.numpy as jnp
    from flamo_tpu.functional import eigvals

    rng = np.random.default_rng(7)
    A = (rng.standard_normal((4, 6, 6))
         + 1j * rng.standard_normal((4, 6, 6))).astype(np.complex64)

    def loss_j(a):
        return jnp.mean((jnp.abs(eigvals(a)) - 1.0) ** 2)

    gj = np.asarray(jax.jit(jax.grad(loss_j))(jnp.asarray(A)))

    At = torch.tensor(A, requires_grad=True)
    lt = torch.mean((torch.abs(torch.linalg.eigvals(At)) - 1.0) ** 2)
    lt.backward()
    gt = At.grad.numpy()
    np.testing.assert_allclose(np.conj(gj), gt, atol=1e-5, rtol=1e-3)
    np.testing.assert_allclose(float(loss_j(jnp.asarray(A))), float(lt),
                               rtol=1e-5)


def test_parity_evs_training_trajectory(ref):
    """Lockstep MSE_evs training (the DAFx-24 Active Acoustics objective,
    reference e8_active_acoustics.py:564-621): trainable FIR matrix in
    series with a frozen room FIR, loop-matrix spectrum on diag-embedded
    impulses, eigenvalue-magnitude MSE over a FIXED bin partition, 10 Adam
    steps from identical raw init — per-step losses must track torch."""
    import jax
    import jax.numpy as jnp
    import optax
    from collections import OrderedDict as OD
    from flamo_tpu.core import trainable_mask
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.optimize.loss import mse_evs

    nfft, N, taps, room_len = 512, 3, 8, 32
    M = nfft // 2 + 1
    rng = np.random.default_rng(31)
    u0 = (0.05 * rng.standard_normal((taps, N, N))).astype(np.float32)
    h0 = (0.3 * rng.standard_normal((room_len, N, N))).astype(np.float32)
    idx = np.sort(rng.choice(M, size=64, replace=False)).astype(np.int32)
    x_time = np.zeros((1, nfft, N), dtype=np.float32)
    x_time[:, 0, :] = 1.0
    lr = 1e-2
    n_steps = 10

    # --- flamo_tpu ---
    U = dsp.Filter(size=(taps, N, N), nfft=nfft, requires_grad=True)
    U = U.assign_value(jnp.asarray(u0))
    H = dsp.Filter(size=(room_len, N, N), nfft=nfft,
                   requires_grad=False).assign_value(jnp.asarray(h0))
    eye = jnp.eye(N, dtype=jnp.float32)
    model = system.Shell(
        core=system.Series(OD([("U", U), ("H", H)])),
        input_layer=system.Series(
            dsp.Transform(lambda x: x[..., None] * eye), dsp.FFT(nfft)))
    crit = mse_evs(iter_num=4, freq_points=M)
    crit.mask_indices = jnp.asarray(idx)[None, :]  # one fixed partition
    xj = jnp.asarray(x_time)
    tj = jnp.ones((1, M, N), dtype=jnp.float32)
    tx = optax.adam(lr)
    mask = trainable_mask(model)
    opt_state = tx.init(model)

    def loss_fn(m):
        return crit(m(xj), tj, step=0, state=crit.mask_indices)

    @jax.jit
    def step(m, o):
        loss, g = jax.value_and_grad(loss_fn)(m)
        g = jax.tree_util.tree_map(
            lambda gr, msk: gr if msk else jnp.zeros_like(gr), g, mask)
        u, o = tx.update(g, o, m)
        return optax.apply_updates(m, u), o, loss

    losses_j = []
    m, o = model, opt_state
    for _ in range(n_steps):
        m, o, l = step(m, o)
        losses_j.append(float(l))

    # --- reference ---
    import torch.nn as nn

    Ut = ref.dsp.Filter(size=(taps, N, N), nfft=nfft, requires_grad=True)
    Ut.assign_value(torch.tensor(u0))
    Ht = ref.dsp.Filter(size=(room_len, N, N), nfft=nfft,
                        requires_grad=False)
    Ht.assign_value(torch.tensor(h0))
    core = nn.Sequential(OD([("U", Ut), ("H", Ht)]))
    mt = ref.sys.Shell(
        core=core,
        input_layer=nn.Sequential(
            ref.dsp.Transform(lambda x: x.diag_embed()),
            ref.dsp.FFT(nfft)))
    opt = torch.optim.Adam(
        [p for p in mt.parameters() if p.requires_grad], lr=lr)
    xt = torch.tensor(x_time)
    idx_t = torch.tensor(idx, dtype=torch.long)
    losses_t = []
    for _ in range(n_steps):
        opt.zero_grad()
        y = mt(xt)
        evs = torch.abs(torch.linalg.eigvals(y[:, idx_t]))
        loss = torch.mean(torch.square(evs - 1.0))
        loss.backward()
        opt.step()
        losses_t.append(float(loss))

    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-3, atol=1e-5)
