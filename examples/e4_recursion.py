"""Closed-loop Recursion (reference examples/e4_recursion.py): MIMO
delays+attenuation in the feedforward path against an orthogonal feedback."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from collections import OrderedDict

import jax.numpy as jnp

import numpy as np

from _common import example_parser, plot_magnitude, plot_signal, setup


def main(args):
    from flamo_tpu.functional import get_eigenvalues
    from flamo_tpu.processor import dsp, system

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
    plot_signal(np.asarray(ir)[0, :, :, 0],
                os.path.join(args.train_dir, "e4_loop_irs.png"),
                title="Closed-loop IR (input 1)", xlim=(0, 2000))

    # closed-loop magnitude response + pole analysis via probe_recursion
    H = model.get_freq_response(fs=args.samplerate, identity=True)
    plot_magnitude(
        {f"H[{i},{i}]": np.asarray(H)[0, :, i, i] for i in range(N)},
        os.path.join(args.train_dir, "e4_loop_mag.png"),
        args.samplerate, nfft, title="Closed-loop magnitude response")

    # stability: eigenvalues of the open-loop matrix stay inside the unit
    # circle (attenuation 0.6 x orthogonal feedback)
    z = jnp.exp(1j * 2 * jnp.pi * jnp.arange(0, nfft // 2, 64) / nfft)
    P = jnp.stack([loop.probe_recursion(zz) for zz in z])
    evs = get_eigenvalues(jnp.eye(N) - P)  # open-loop eigenvalues
    rho = float(jnp.abs(evs).max())
    print(f"open-loop spectral radius over probed bins: {rho:.3f} (< 1)")
    assert rho < 1.0


if __name__ == "__main__":
    args = setup(example_parser(nfft=4096).parse_args())
    main(args)
