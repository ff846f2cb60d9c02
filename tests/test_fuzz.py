"""Property-based composition fuzzing: random module graphs must satisfy
probe == forward == linop-materialized response, with finite gradients."""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flamo_tpu
from flamo_tpu.ops import linop
from flamo_tpu.processor import dsp, system

NFFT = 512
M = NFFT // 2 + 1


def _random_mimo(rng, n_in, n_out):
    choice = rng.integers(0, 9)
    kw = dict(nfft=NFFT)
    if choice == 6 and n_in == n_out and n_in > 1:
        return dsp.HouseholderMatrix(size=(n_in, n_in), **kw)
    if choice == 7:
        return dsp.GEQ(size=(n_out, n_in), octave_interval=1, fs=48000,
                       requires_grad=True, **kw)
    if choice == 8:
        return dsp.SOSFilter(size=(n_out, n_in), n_sections=2, fs=48000,
                             **kw)
    if choice == 0:
        return dsp.Gain(size=(n_out, n_in), requires_grad=True, **kw)
    if choice == 1:
        return dsp.Filter(size=(int(rng.integers(2, 12)), n_out, n_in),
                          requires_grad=True, **kw)
    if choice == 2:
        return dsp.Delay(size=(n_out, n_in), max_len=32, isint=True, **kw)
    if choice == 3:
        return dsp.Biquad(size=(n_out, n_in), n_sections=2,
                          filter_type="lowpass", fs=48000,
                          requires_grad=True, **kw)
    if choice == 4:
        return dsp.SVF(size=(n_out, n_in), n_sections=1,
                       filter_type="peaking", fs=48000, requires_grad=True,
                       **kw)
    return dsp.GainDelay(size=(n_out, n_in), max_len=16, isint=True, **kw)


def _random_diag(rng, n):
    choice = rng.integers(0, 5)
    kw = dict(nfft=NFFT)
    if choice == 0:
        return dsp.parallelGain(size=(n,), requires_grad=True, **kw)
    if choice == 1:
        return dsp.parallelFilter(size=(int(rng.integers(2, 12)), n),
                                  requires_grad=True, **kw)
    if choice == 2:
        return dsp.parallelDelay(size=(n,), max_len=32, isint=True, **kw)
    if choice == 3:
        return dsp.parallelBiquad(size=(n,), n_sections=1,
                                  filter_type="highpass", fs=48000, **kw)
    return dsp.parallelSVF(size=(n,), n_sections=1, filter_type="lowpass",
                           fs=48000, **kw)


def _random_graph(rng, n_in, n_out, depth=0):
    kind = rng.integers(0, 5 if depth < 2 else 2)
    if kind == 0 or depth >= 2:
        return _random_mimo(rng, n_in, n_out)
    if kind == 1 and n_in == n_out:
        return _random_diag(rng, n_in)
    if kind == 4:
        a = _random_graph(rng, n_in, n_out, depth + 1)
        b = _random_graph(rng, n_in, n_out, depth + 1)
        return system.Parallel(a, b, sum_output=True)
    if kind == 2:
        mid = int(rng.integers(1, 4))
        a = _random_graph(rng, n_in, mid, depth + 1)
        b = _random_graph(rng, mid, n_out, depth + 1)
        return system.Series(OrderedDict({f"a{depth}": a, f"b{depth}": b}))
    # recursion: square loop around n_out
    ff = _random_graph(rng, n_out, n_out, depth + 1)
    # keep the loop stable: scale by a small gain
    damp = dsp.parallelGain(size=(n_out,), nfft=NFFT)
    damp = damp.assign_value(0.2 * jnp.ones(n_out))
    loop = system.Recursion(
        fF=system.Series(OrderedDict({f"m{depth}": ff, f"d{depth}": damp})),
        fB=dsp.Matrix(size=(n_out, n_out), nfft=NFFT,
                      matrix_type="orthogonal"))
    if n_in == n_out:
        return loop
    pre = dsp.Gain(size=(n_out, n_in), nfft=NFFT)
    return system.Series(OrderedDict({f"p{depth}": pre, f"l{depth}": loop}))


@pytest.mark.parametrize("seed", range(24))
def test_random_graph_consistency(seed):
    flamo_tpu.set_seed(1000 + seed)
    rng = np.random.default_rng(seed)
    n_in = int(rng.integers(1, 4))
    n_out = int(rng.integers(1, 4))
    graph = _random_graph(rng, n_in, n_out)

    x = jnp.asarray(rng.normal(size=(1, M, n_in))
                    + 1j * rng.normal(size=(1, M, n_in)),
                    dtype=jnp.complex64)
    y = graph(x)
    assert y.shape == (1, M, n_out), seed
    assert np.isfinite(np.asarray(y)).all(), seed

    # linop response agrees with forward
    r = graph.matrix_response() if hasattr(graph, "matrix_response") else None
    if r is not None:
        y_op = linop.apply(r[0], r[1], x)
        err = float(jnp.abs(y_op - y).max())
        scale = float(jnp.abs(y).max()) + 1e-6
        assert err / scale < 1e-3, (seed, err, scale)

    # probe agrees with forward at a few bins
    for m_idx in [1, M // 3, M - 1]:
        z = jnp.exp(1j * 2 * jnp.pi * m_idx / NFFT)
        Hp = graph.probe(z)
        if Hp is None:
            continue
        y_bin = np.asarray(Hp) @ np.asarray(x)[0, m_idx]
        rel = np.abs(y_bin - np.asarray(y)[0, m_idx]).max() / scale
        assert rel < 5e-3, (seed, m_idx)

    # gradients are finite
    def loss(g):
        return jnp.mean(jnp.abs(g(x)) ** 2)

    grads = jax.grad(loss)(graph)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all(), seed
