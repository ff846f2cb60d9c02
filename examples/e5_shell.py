"""Shell container (reference examples/e5_shell.py): layer swapping, IO
errors, get_time_response / get_freq_response incl. identity=True."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from collections import OrderedDict

import jax.numpy as jnp

from _common import example_parser, setup


def main(args):
    from flamo_tpu.processor import dsp, system

    nfft = args.nfft
    N = 3

    core = system.Series(OrderedDict({
        "in": dsp.Gain(size=(N, 1), nfft=nfft),
        "filt": dsp.parallelFilter(size=(16, N), nfft=nfft),
        "out": dsp.Gain(size=(1, N), nfft=nfft),
    }))

    # IO mismatch between layer and core raises
    try:
        system.Shell(core=core, input_layer=dsp.Gain(size=(2, 2), nfft=nfft))
        raise RuntimeError("should have raised")
    except AssertionError as e:
        print("shell IO error caught:", str(e)[:70], "...")

    model = system.Shell(core=core, input_layer=dsp.FFT(nfft),
                         output_layer=dsp.iFFT(nfft))
    ir = model.get_time_response(fs=args.samplerate)
    H = model.get_freq_response(fs=args.samplerate)
    print("time response:", ir.shape, "| freq response:", H.shape)

    # identity=True on a MIMO core gives input-free responses
    mimo = system.Shell(core=dsp.Matrix(size=(N, N), nfft=nfft,
                                        matrix_type="orthogonal"),
                        input_layer=dsp.FFT(nfft),
                        output_layer=dsp.iFFT(nfft))
    ir_id = mimo.get_time_response(fs=args.samplerate, identity=True)
    print("identity IRs:", ir_id.shape)
    assert ir_id.shape == (1, nfft, N, N)

    # functional layer swap
    m2 = model.set_outputLayer(dsp.Transform(lambda z: jnp.abs(z)))
    print("swapped output layer:", type(m2.get_outputLayer()).__name__)
    assert isinstance(model.get_outputLayer(), dsp.iFFT)


if __name__ == "__main__":
    args = setup(example_parser(nfft=4096).parse_args())
    main(args)
