"""Consistency asserts (reference examples/e10_probe.py): the z-plane probe,
the forward pass on an identity spectrum, and the rendered frequency
response must agree to < 5e-3."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from _common import example_parser, setup


def main(args):
    import flamo_tpu
    from flamo_tpu.processor import dsp, system

    np.random.seed(42)
    nfft = args.nfft
    M = nfft // 2 + 1
    N = 3
    delays = (89, 97, 107)

    dl = dsp.parallelDelay(size=(N,), max_len=max(delays) + 1, nfft=nfft,
                           isint=True)
    dl = dl.assign_value(dl.sample2s(jnp.asarray(delays, jnp.float32)))
    att = dsp.parallelGain(size=(N,), nfft=nfft)
    att = att.assign_value(0.8 * jnp.ones(N))
    fb = dsp.Matrix(size=(N, N), nfft=nfft, matrix_type="orthogonal")
    loop = system.Recursion(
        fF=system.Series(OrderedDict({"d": dl, "a": att})), fB=fb)
    ig = dsp.Gain(size=(N, 1), nfft=nfft)
    og = dsp.Gain(size=(1, N), nfft=nfft)
    core = system.Series(OrderedDict({"i": ig, "l": loop, "o": og}))
    model = system.Shell(core=core, input_layer=dsp.FFT(nfft),
                         output_layer=dsp.iFFT(nfft))

    # path 1: frequency response via Shell rendering
    H_render = np.asarray(model.get_freq_response(fs=args.samplerate))[0, :, 0]

    # path 2: probe per z over the rfft grid (vmapped batched probe)
    zs = jnp.exp(1j * 2 * jnp.pi * jnp.arange(M) / nfft)
    probe_batched = jax.vmap(lambda z: model.probe(z)[0, 0])
    H_probe = np.asarray(probe_batched(zs))

    # path 3: core forward on an impulse spectrum (all-ones input)
    X = jnp.ones((1, M, 1), dtype=jnp.complex64)
    H_fwd = np.asarray(core(X))[0, :, 0]

    err_pr = np.abs(H_probe - H_render).max()
    err_fr = np.abs(H_fwd - H_render).max()
    err_pf = np.abs(H_probe - H_fwd).max()
    print(f"|probe - render|  = {err_pr:.2e}")
    print(f"|forward - render|= {err_fr:.2e}")
    print(f"|probe - forward| = {err_pf:.2e}")
    assert err_pr < 5e-3 and err_fr < 5e-3 and err_pf < 5e-3
    print("all three response paths agree")


if __name__ == "__main__":
    args = setup(example_parser(nfft=2048).parse_args())
    main(args)
