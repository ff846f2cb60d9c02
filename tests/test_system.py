"""System composition tests: Series/Recursion/Parallel/Shell vs time-domain
oracles (SURVEY.md §4 oracle (a): probe == forward-on-ones; custom oracle:
freq-sampled FDN IR == direct time-domain recursion)."""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flamo_tpu
from flamo_tpu.processor import dsp, system

NFFT = 2048
M = NFFT // 2 + 1


def build_fdn(N=4, nfft=NFFT, alias_decay_db=0.0, g=0.97, delays=(13, 17, 19, 23)):
    """Small FDN with homogeneous per-line attenuation g^m."""
    ig = dsp.Gain(size=(N, 1), nfft=nfft, alias_decay_db=alias_decay_db,
                  requires_grad=True)
    og = dsp.Gain(size=(1, N), nfft=nfft, alias_decay_db=alias_decay_db,
                  requires_grad=True)
    fb = dsp.Matrix(size=(N, N), nfft=nfft, matrix_type="orthogonal",
                    alias_decay_db=alias_decay_db, requires_grad=True)
    dl = dsp.parallelDelay(size=(N,), max_len=max(delays) + 1, nfft=nfft,
                           isint=True, alias_decay_db=alias_decay_db)
    dl = dl.assign_value(dl.sample2s(jnp.asarray(delays, dtype=jnp.float32)))
    att = dsp.parallelGain(size=(N,), nfft=nfft,
                           alias_decay_db=alias_decay_db)
    att = att.assign_value(g ** jnp.asarray(delays, dtype=jnp.float32))
    ff = system.Series(OrderedDict({"delays": dl, "attenuation": att}))
    rec = system.Recursion(fF=ff, fB=fb)
    core = system.Series(OrderedDict({
        "input_gain": ig, "feedback_loop": rec, "output_gain": og}))
    return core


def simulate_fdn_time(core, n_samples):
    """Direct time-domain simulation of the same FDN (numpy oracle)."""
    ig = np.asarray(core.input_gain.param)          # (N, 1)
    og = np.asarray(core.output_gain.param)         # (1, N)
    rec = core.feedback_loop
    A = np.asarray(rec.feedback.map(rec.feedback.param))    # (N, N)
    ff = rec.feedforward
    delays = np.round(np.asarray(
        ff.delays.get_delays(ff.delays.param))).astype(int)  # (N,)
    g = np.asarray(ff.attenuation.map(ff.attenuation.param))  # (N,)
    N = len(delays)
    u = np.zeros((n_samples + delays.max() + 1, N))  # loop input history
    y = np.zeros((n_samples, 1))
    x = np.zeros(n_samples)
    x[0] = 1.0
    for n in range(n_samples):
        # w[n] = fF(u)[n] = g * u[n - m]
        w = np.array([g[i] * (u[n - delays[i], i] if n - delays[i] >= 0
                              else 0.0) for i in range(N)])
        # loop input u[n] = ig x[n] + A @ w[n]
        u[n] = (ig[:, 0] * x[n]) + A @ w
        y[n] = og[0] @ w
    return y[:, 0]


def test_fdn_matches_time_domain_oracle():
    flamo_tpu.set_seed(42)
    core = build_fdn()
    model = system.Shell(core=core, input_layer=dsp.FFT(NFFT),
                         output_layer=dsp.iFFT(NFFT))
    imp = jnp.zeros((1, NFFT, 1)).at[:, 0, :].set(1.0)
    ir = np.asarray(model(imp))[0, :, 0]
    ref = simulate_fdn_time(core, NFFT)
    # residual energy after nfft samples bounds the time-aliasing error
    assert np.abs(ir - ref).max() < 1e-3


def test_fdn_alias_envelope_reduces_aliasing():
    flamo_tpu.set_seed(1)
    # slow decay -> visible aliasing without the envelope
    core0 = build_fdn(g=0.999, alias_decay_db=0.0)
    ref = simulate_fdn_time(core0, NFFT)

    def ir_of(core, alias_db):
        model = system.Shell(core=core, input_layer=dsp.FFT(NFFT),
                             output_layer=dsp.iFFT(NFFT))
        imp = jnp.zeros((1, NFFT, 1)).at[:, 0, :].set(1.0)
        y = np.asarray(model(imp))[0, :, 0]
        if alias_db:
            gamma = 10 ** (-alias_db / NFFT / 20)
            y = y * gamma ** np.arange(0, -NFFT, -1)
        return y

    err0 = np.abs(ir_of(core0, 0) - ref).max()
    flamo_tpu.set_seed(1)
    core1 = build_fdn(g=0.999, alias_decay_db=30.0)
    err1 = np.abs(ir_of(core1, 30.0) - ref).max()
    assert err1 < err0


def test_probe_equals_freq_response():
    """e10 oracle: probe(z_m) over rfft grid == forward response."""
    flamo_tpu.set_seed(7)
    core = build_fdn()
    model = system.Shell(core=core, input_layer=dsp.FFT(NFFT),
                         output_layer=dsp.iFFT(NFFT))
    H = np.asarray(model.get_freq_response(fs=48000))[0, :, 0]
    for m in [0, 100, 777, M - 1]:
        z = np.exp(1j * 2 * np.pi * m / NFFT)
        Hp = np.asarray(model.probe(jnp.asarray(z)))
        assert np.abs(Hp[0, 0] - H[m]) < 5e-3, m


def test_series_validation_errors():
    g1 = dsp.Gain(size=(3, 2), nfft=NFFT)
    g2 = dsp.Gain(size=(4, 4), nfft=NFFT)
    with pytest.raises(AssertionError):
        system.Series(g1, g2)  # 3 out vs 4 in
    g3 = dsp.Gain(size=(2, 2), nfft=4096)
    with pytest.raises(ValueError):
        system.Series(dsp.Gain(size=(2, 2), nfft=NFFT), g3)  # nfft mismatch


def test_series_key_semantics():
    g1 = dsp.Gain(size=(2, 2), nfft=NFFT)
    g2 = dsp.Gain(size=(2, 2), nfft=NFFT)
    s = system.Series(OrderedDict({"a": g1, "b": g2}))
    assert s.keys == ("a", "b")
    assert s["a"] is g1 and s.b is g2
    # duplicate custom keys raise
    with pytest.raises(ValueError):
        system.Series(OrderedDict({"a": g1}), OrderedDict({"a": g2}))
    # nested flattening
    s2 = system.Series(s, dsp.Gain(size=(3, 2), nfft=NFFT))
    assert len(s2) == 3
    assert s2.keys[:2] == ("a", "b")


def test_series_insert_append_functional():
    g1 = dsp.Gain(size=(2, 2), nfft=NFFT)
    s = system.Series(g1)
    s2 = s.append(dsp.Gain(size=(3, 2), nfft=NFFT))
    assert len(s) == 1 and len(s2) == 2
    s3 = s2.prepend(dsp.Gain(size=(2, 5), nfft=NFFT))
    assert s3.input_channels == 5 and s3.output_channels == 3


def test_parallel_sum_and_concat():
    g1 = dsp.Gain(size=(3, 2), nfft=NFFT)
    g2 = dsp.Gain(size=(3, 2), nfft=NFFT)
    p = system.Parallel(g1, g2, sum_output=True)
    x = jnp.ones((1, M, 2), dtype=jnp.complex64)
    y = p(x)
    assert y.shape == (1, M, 3)
    assert np.allclose(np.asarray(y), np.asarray(g1(x) + g2(x)), atol=1e-6)
    pc = system.Parallel(g1, g2, sum_output=False)
    assert pc(x).shape == (1, M, 6)
    assert pc.output_channels == 6


def test_recursion_io_validation():
    g1 = dsp.Gain(size=(3, 2), nfft=NFFT)
    g2 = dsp.Gain(size=(3, 2), nfft=NFFT)
    with pytest.raises(AssertionError):
        system.Recursion(fF=g1, fB=g2)  # 3 out needs fB with 3 in


def test_shell_identity_time_response():
    flamo_tpu.set_seed(3)
    core = build_fdn()
    # identity=False: (1, nfft, 1); the FDN is SISO at shell level
    model = system.Shell(core=core, input_layer=dsp.FFT(NFFT),
                         output_layer=dsp.iFFT(NFFT))
    ir = model.get_time_response(fs=48000)
    assert ir.shape == (1, NFFT, 1)
    # MIMO core without in/out gains: identity=True diag-embeds
    rec = core.feedback_loop
    model2 = system.Shell(core=rec, input_layer=dsp.FFT(NFFT),
                          output_layer=dsp.iFFT(NFFT))
    ir2 = model2.get_time_response(fs=48000, identity=True)
    assert ir2.shape == (1, NFFT, 4, 4)


def test_shell_layer_swap_functional():
    core = build_fdn()
    model = system.Shell(core=core, input_layer=dsp.FFT(NFFT),
                         output_layer=dsp.iFFT(NFFT))
    m2 = model.set_outputLayer(dsp.Transform(lambda x: jnp.abs(x)))
    assert isinstance(model.get_outputLayer(), dsp.iFFT)  # unchanged
    assert isinstance(m2.get_outputLayer(), dsp.Transform)


def test_ext_param_threading():
    g = dsp.Gain(size=(2, 2), nfft=NFFT, requires_grad=True)
    s = system.Series(OrderedDict({"gain": g}))
    x = jnp.ones((1, M, 2), dtype=jnp.complex64)
    y = s(x, ext_param={"gain": jnp.eye(2)})
    assert np.allclose(np.asarray(y[0, 0]), np.ones(2), atol=1e-6)


def test_whole_model_jits_once():
    flamo_tpu.set_seed(0)
    core = build_fdn()
    model = system.Shell(core=core, input_layer=dsp.FFT(NFFT),
                         output_layer=dsp.Transform(lambda x: jnp.abs(x)))
    imp = jnp.zeros((1, NFFT, 1)).at[:, 0, :].set(1.0)

    calls = {"n": 0}

    @jax.jit
    def fwd(mdl, x):
        calls["n"] += 1
        return mdl(x)

    y1 = fwd(model, imp)
    # updated params, same structure: no retrace
    model2 = jax.tree_util.tree_map(lambda x: x * 1.01, model)
    y2 = fwd(model2, imp)
    assert calls["n"] == 1
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
