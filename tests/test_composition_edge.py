"""Composition edge cases: nested recursions, deep ext_param threading,
matrix_response consistency with the identity-feed fallback."""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flamo_tpu
from flamo_tpu.processor import dsp, system

NFFT = 1024
M = NFFT // 2 + 1


def test_nested_recursion_in_series_in_recursion():
    """A Recursion whose feedforward contains another Recursion."""
    flamo_tpu.set_seed(3)
    N = 3
    inner_d = dsp.parallelDelay(size=(N,), max_len=32, isint=True, nfft=NFFT)
    inner_g = dsp.parallelGain(size=(N,), nfft=NFFT)
    inner_g = inner_g.assign_value(0.3 * jnp.ones(N))
    inner = system.Recursion(fF=inner_d, fB=inner_g)

    outer_ff = system.Series(OrderedDict({
        "pre": dsp.parallelGain(size=(N,), nfft=NFFT).assign_value(
            0.5 * jnp.ones(N)),
        "loop": inner,
    }))
    outer_fb = dsp.Matrix(size=(N, N), nfft=NFFT, matrix_type="orthogonal")
    outer = system.Recursion(fF=outer_ff, fB=outer_fb)

    x = jnp.ones((1, M, N), dtype=jnp.complex64)
    y = outer(x)
    assert y.shape == (1, M, N)
    assert np.isfinite(np.asarray(y)).all()

    # linop path vs identity-feed fallback must agree
    class _NoMR(dsp.Transform):
        """Transform that forwards unchanged but breaks the linop path."""

        def __init__(self, nfft):
            super().__init__(transform=lambda z: z)
            self.nfft = nfft
            # no matrix_response -> Series returns None -> fallback

    ff_fallback = system.Series(OrderedDict({
        "pre": outer_ff["pre"], "loop": inner, "noop": _NoMR(NFFT)}))
    outer_fb2 = outer_fb
    outer2 = system.Recursion(fF=ff_fallback, fB=outer_fb2)
    y2 = outer2(x)
    assert np.abs(np.asarray(y) - np.asarray(y2)).max() < 1e-3


def test_ext_param_deep_threading():
    """ext_param keys thread through Series -> Recursion -> Series."""
    flamo_tpu.set_seed(4)
    N = 2
    d = dsp.parallelDelay(size=(N,), max_len=16, isint=True, nfft=NFFT)
    att = dsp.parallelGain(size=(N,), nfft=NFFT, requires_grad=True)
    ff = system.Series(OrderedDict({"delays": d, "attenuation": att}))
    fb = dsp.parallelGain(size=(N,), nfft=NFFT)
    fb = fb.assign_value(0.5 * jnp.ones(N))
    loop = system.Recursion(fF=ff, fB=fb)
    core = system.Series(OrderedDict({
        "ig": dsp.Gain(size=(N, 1), nfft=NFFT).assign_value(jnp.ones((N, 1))),
        "loop": loop,
        "og": dsp.Gain(size=(1, N), nfft=NFFT).assign_value(jnp.ones((1, N))),
    }))
    x = jnp.ones((1, M, 1), dtype=jnp.complex64)

    y_a = core(x, ext_param={"loop.feedforward.attenuation":
                             0.1 * jnp.ones(N)})
    y_b = core(x, ext_param={"loop.feedforward.attenuation":
                             0.9 * jnp.ones(N)})
    assert not np.allclose(np.asarray(y_a), np.asarray(y_b))

    # equivalent to assigning the value directly
    att2 = att.assign_value(0.1 * jnp.ones(N))
    core2 = system.Series(OrderedDict({
        "ig": core["ig"],
        "loop": system.Recursion(
            fF=system.Series(OrderedDict({"delays": d,
                                          "attenuation": att2})), fB=fb),
        "og": core["og"],
    }))
    y_ref = core2(x)
    assert np.abs(np.asarray(y_a) - np.asarray(y_ref)).max() < 1e-5


def test_matrix_response_matches_forward_for_all_kinds():
    """apply(matrix_response) == __call__ for flat/diag/full modules."""
    from flamo_tpu.ops import linop

    flamo_tpu.set_seed(5)
    mods = [
        dsp.Gain(size=(3, 2), nfft=NFFT),
        dsp.parallelGain(size=(3,), nfft=NFFT),
        dsp.HouseholderMatrix(size=(3, 3), nfft=NFFT),
        dsp.Filter(size=(8, 3, 2), nfft=NFFT, alias_decay_db=20),
        dsp.parallelFilter(size=(8, 3), nfft=NFFT),
        dsp.parallelDelay(size=(3,), max_len=16, isint=True, nfft=NFFT),
        dsp.Delay(size=(2, 3), max_len=16, isint=True, nfft=NFFT),
        dsp.parallelSVF(size=(3,), n_sections=1, filter_type="lowpass",
                        nfft=NFFT),
        dsp.GainDelay(size=(2, 3), max_len=16, isint=True, nfft=NFFT),
    ]
    for mod in mods:
        n_in = mod.input_channels
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, M, n_in))
            + 1j * np.random.default_rng(2).normal(size=(1, M, n_in)),
            dtype=jnp.complex64)
        kind, H = mod.matrix_response()
        y_op = linop.apply(kind, H, x)
        y_fwd = mod(x)
        err = np.abs(np.asarray(y_op) - np.asarray(y_fwd)).max()
        assert err < 1e-4, (type(mod).__name__, err)


def test_parallel_matrix_response_sum_and_concat():
    from flamo_tpu.ops import linop

    g1 = dsp.Gain(size=(3, 2), nfft=NFFT)
    g2 = dsp.Gain(size=(3, 2), nfft=NFFT)
    x = jnp.ones((1, M, 2), dtype=jnp.complex64)
    for sum_output in [True, False]:
        p = system.Parallel(g1, g2, sum_output=sum_output)
        kind, H = p.matrix_response()
        y_op = linop.apply(kind, H, x)
        y_fwd = p(x)
        assert np.abs(np.asarray(y_op) - np.asarray(y_fwd)).max() < 1e-5
