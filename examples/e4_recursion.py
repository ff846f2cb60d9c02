"""Closed-loop Recursion (reference examples/e4_recursion.py): MIMO
delays+attenuation in the feedforward path against an orthogonal feedback."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from collections import OrderedDict

import jax.numpy as jnp

from _common import example_parser, setup


def main(args):
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.functional import signal_gallery

    nfft = args.nfft
    N = 3

    delays = dsp.parallelDelay(size=(N,), max_len=300, isint=True, nfft=nfft)
    atten = dsp.parallelGain(size=(N,), nfft=nfft)
    atten = atten.assign_value(0.6 * jnp.ones(N))
    ff = system.Series(OrderedDict({"delays": delays, "attenuation": atten}))
    fb = dsp.Matrix(size=(N, N), nfft=nfft, matrix_type="orthogonal")
    loop = system.Recursion(fF=ff, fB=fb)

    model = system.Shell(core=loop, input_layer=dsp.FFT(nfft),
                         output_layer=dsp.iFFT(nfft))
    ir = model.get_time_response(fs=args.samplerate, identity=True)
    print("closed-loop input-free IRs:", ir.shape)
    energy = float(jnp.sum(ir ** 2))
    print("loop IR energy:", energy)
    assert jnp.isfinite(energy)


if __name__ == "__main__":
    args = setup(example_parser(nfft=4096).parse_args())
    main(args)
