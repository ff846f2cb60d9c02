"""Integration scenarios beyond the unit suites: factory-model training,
grouped FDN design, scattering-FDN training, probe consistency with IIR
chains."""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flamo_tpu
from flamo_tpu.auxiliary import reverb
from flamo_tpu.auxiliary.config import HomogeneousFDNConfig
from flamo_tpu.processor import dsp, system

NFFT = 2048
M = NFFT // 2 + 1


def test_homogeneous_fdn_trains():
    import optax
    from flamo_tpu.core import trainable_mask

    flamo_tpu.set_seed(9)
    cfg = HomogeneousFDNConfig(N=4, nfft=NFFT, delays=[89, 97, 107, 113],
                               alias_decay_db=0)
    fdn = reverb.HomogeneousFDN(cfg)
    model = fdn.model.set_outputLayer(dsp.Transform(lambda z: jnp.abs(z)))
    model = model.set_inputLayer(dsp.FFT(NFFT))

    x = jnp.zeros((1, NFFT, 1)).at[:, 0, :].set(1.0)
    target = jnp.ones((1, M, 1))
    tx = optax.adam(5e-3)
    mask = trainable_mask(model)
    opt_state = tx.init(model)

    def loss_fn(m):
        return jnp.mean((jnp.sum(m(x), axis=-1)
                         - jnp.squeeze(target, -1)) ** 2)

    @jax.jit
    def step2(m, o):
        loss, g = jax.value_and_grad(loss_fn)(m)
        g = jax.tree_util.tree_map(
            lambda gr, msk: gr if msk else jnp.zeros_like(gr), g, mask)
        u, o = tx.update(g, o, m)
        return optax.apply_updates(m, u), o, loss

    loss0 = float(loss_fn(model))
    m, o = model, opt_state
    for _ in range(25):
        m, o, loss = step2(m, o)
    assert float(loss) < loss0
    # frozen delay lines unchanged
    d0 = np.asarray(model.get_core().feedback_loop.feedforward.delays.param)
    d1 = np.asarray(m.get_core().feedback_loop.feedforward.delays.param)
    assert np.allclose(d0, d1)


def test_gfdn_accurate_geq():
    g = reverb.parallelGFDNAccurateGEQ(octave_interval=1, n_groups=2,
                                       nfft=NFFT, fs=48000,
                                       delays=jnp.asarray([89, 97]))
    H = np.asarray(g.response())
    assert H.shape == (M, 2)
    assert np.isfinite(H).all()
    kind, Hm = g.matrix_response()
    assert kind == "diag"


def test_scattering_fdn_trains():
    import optax
    from flamo_tpu.core import trainable_mask

    flamo_tpu.set_seed(10)
    N = 4
    delays = (89, 97, 107, 113)
    dl = dsp.parallelDelay(size=(N,), max_len=max(delays), nfft=NFFT,
                           isint=True, alias_decay_db=20)
    dl = dl.assign_value(dl.sample2s(jnp.asarray(delays, jnp.float32)))
    fb = dsp.ScatteringMatrix(size=(3, N, N), nfft=NFFT, gain_per_sample=1.0,
                              sparsity=2, alias_decay_db=20,
                              requires_grad=True)
    ig = dsp.Gain(size=(N, 1), nfft=NFFT, requires_grad=True,
                  alias_decay_db=20)
    og = dsp.Gain(size=(1, N), nfft=NFFT, requires_grad=True,
                  alias_decay_db=20)
    core = system.Series(OrderedDict({
        "i": ig, "l": system.Recursion(fF=dl, fB=fb), "o": og}))
    model = system.Shell(core=core, input_layer=dsp.FFT(NFFT),
                         output_layer=dsp.Transform(lambda z: jnp.abs(z)))

    x = jnp.zeros((1, NFFT, 1)).at[:, 0, :].set(1.0)
    target = jnp.ones((1, M, 1))
    tx = optax.adam(1e-2)
    mask = trainable_mask(model)
    o = tx.init(model)

    def loss_fn(m):
        return jnp.mean((jnp.sum(m(x), -1) - jnp.squeeze(target, -1)) ** 2)

    @jax.jit
    def step(m, o):
        loss, g = jax.value_and_grad(loss_fn)(m)
        g = jax.tree_util.tree_map(
            lambda gr, msk: gr if msk else jnp.zeros_like(gr), g, mask)
        u, o = tx.update(g, o, m)
        return optax.apply_updates(m, u), o, loss

    loss0 = float(loss_fn(model))
    m = model
    for _ in range(20):
        m, o, loss = step(m, o)
    assert float(loss) < loss0
    # the scattering stages stay orthogonal (map enforces it)
    U = m.get_core().l.feedback.map(m.get_core().l.feedback.param)
    for k in range(U.shape[0]):
        assert float(jnp.abs(U[k] @ U[k].T - jnp.eye(N)).max()) < 1e-4


def test_probe_consistency_iir_chain():
    """e10-style triple consistency for a Series with IIR members."""
    flamo_tpu.set_seed(11)
    chain = system.Series(OrderedDict({
        "g": dsp.Gain(size=(2, 1), nfft=NFFT),
        "svf": dsp.SVF(size=(2, 2), n_sections=1, filter_type="peaking",
                       nfft=NFFT, fs=48000),
        "bq": dsp.parallelBiquad(size=(2,), n_sections=1,
                                 filter_type="lowpass", nfft=NFFT, fs=48000),
        "o": dsp.Gain(size=(1, 2), nfft=NFFT),
    }))
    X = jnp.ones((1, M, 1), dtype=jnp.complex64)
    H_fwd = np.asarray(chain(X))[0, :, 0]
    for m_idx in [0, 37, 500, M - 1]:
        z = jnp.exp(1j * 2 * jnp.pi * m_idx / NFFT)
        Hp = np.asarray(chain.probe(z))[0, 0]
        assert abs(Hp - H_fwd[m_idx]) < 5e-3, m_idx
    # linop path agrees too
    kind, Hm = chain.matrix_response()
    from flamo_tpu.ops import linop

    H_lin = np.asarray(linop.materialize(kind, Hm, M, 1, 1))[:, 0, 0]
    assert np.abs(H_lin - H_fwd).max() < 1e-4
