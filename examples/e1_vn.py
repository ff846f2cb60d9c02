"""Velvet-noise filter demo (reference examples/e1_vn.py)."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp

from _common import example_parser, setup


def main(args):
    from flamo_tpu.auxiliary.velvet import VelvetNoiseFilter
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.functional import signal_gallery

    nfft = args.nfft
    v = VelvetNoiseFilter(size=(nfft // 8, 1, 1), density=1000.0,
                          sample_rate=args.samplerate, nfft=nfft)
    model = system.Shell(core=v, input_layer=dsp.FFT(nfft),
                         output_layer=dsp.iFFT(nfft))
    x = signal_gallery(1, nfft, 1, "impulse")
    y = model(x)
    nz = int(jnp.sum(jnp.abs(y) > 1e-6))
    print(f"velvet IR: {nz} nonzero samples of {nfft}")
    v2 = v.resample()
    y2 = model.set_core(v2)(x)
    print("resampled differs:", bool(jnp.abs(y - y2).max() > 0))


if __name__ == "__main__":
    args = setup(example_parser(nfft=4096).parse_args())
    main(args)
