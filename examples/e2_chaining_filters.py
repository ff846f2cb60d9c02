"""Manual module chaining (reference examples/e2_chaining_filters.py):
cascading modules by hand, assign_value, requires_grad behavior."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp

from _common import example_parser, setup


def main(args):
    from flamo_tpu.core import trainable_mask
    from flamo_tpu.processor import dsp
    from flamo_tpu.functional import signal_gallery

    nfft = args.nfft

    # manual chain: gain -> biquad -> delay, composed by function calls
    g = dsp.Gain(size=(2, 1), nfft=nfft, requires_grad=True)
    bq = dsp.parallelBiquad(size=(2,), n_sections=1, filter_type="highpass",
                            nfft=nfft, fs=args.samplerate)
    d = dsp.parallelDelay(size=(2,), max_len=100, isint=True, nfft=nfft)

    X = dsp.FFT(nfft)(signal_gallery(1, nfft, 1, "impulse"))
    Y = d(bq(g(X)))
    y = dsp.iFFT(nfft)(Y)
    print("chained output:", y.shape)

    # assign_value is functional: returns a new module
    g2 = g.assign_value(jnp.asarray([[1.0], [2.0]]))
    assert float(jnp.abs(g.param - g2.param).max()) > 0
    print("assign_value returns new module; original untouched")

    # requires_grad governs the trainable mask
    mask_g = trainable_mask(g)
    mask_bq = trainable_mask(bq)
    print("gain trainable:", bool(jax.tree_util.tree_leaves(mask_g)[0]))
    print("biquad trainable:", bool(jax.tree_util.tree_leaves(mask_bq)[0]))
    assert jax.tree_util.tree_leaves(mask_g)[0] is True
    assert jax.tree_util.tree_leaves(mask_bq)[0] is False


if __name__ == "__main__":
    args = setup(example_parser(nfft=4096).parse_args())
    main(args)
