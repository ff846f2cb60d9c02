"""MIMO processors (reference examples/e1_mimo.py): the Matrix gallery, MIMO
Delay, and a trained Biquad bank matching a target magnitude response."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from _common import example_parser, plot_magnitude, plot_signal, setup


def main(args):
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.optimize import Dataset, Trainer, load_dataset
    from flamo_tpu.functional import signal_gallery

    nfft = args.nfft
    M = nfft // 2 + 1

    # 1) Matrix gallery (incl. "identity", which the reference example
    # passes and the reference module silently treats as "random")
    for mtype in ["random", "identity", "orthogonal", "hadamard",
                  "rotation"]:
        m = dsp.Matrix(size=(4, 4), nfft=nfft, matrix_type=mtype)
        U = m.map(m.param)
        print(f"{mtype:>10}: ||U U^T - I|| =",
              float(jnp.abs(U @ U.T - jnp.eye(4)).max()))

    # 2) MIMO delays
    d = dsp.Delay(size=(2, 3), max_len=500, isint=True, nfft=nfft)
    x = signal_gallery(1, nfft, 3, "impulse")
    y = dsp.iFFT(nfft)(d(dsp.FFT(nfft)(x)))
    print("MIMO delay output:", y.shape)
    plot_signal(y, os.path.join(args.train_dir, "e1_mimo_delay_ir.png"),
                title="MIMO delay IR", xlim=(0, 600))

    # 3) train a 2-section Biquad bank to a lowpass target magnitude
    bq = dsp.Biquad(size=(1, 1), n_sections=2, filter_type="lowpass",
                    nfft=nfft, fs=args.samplerate, requires_grad=True)
    model = system.Shell(core=bq, input_layer=dsp.FFT(nfft),
                         output_layer=dsp.Transform(lambda z: jnp.abs(z)))
    from flamo_tpu.functional import lowpass_filter, biquad2tf

    b, a = lowpass_filter(fc=2000.0, gain=2.0, fs=args.samplerate)
    target = jnp.abs(biquad2tf(b, a, nfft))[None, :, None]
    ds = Dataset(input=signal_gallery(1, M, 1, "impulse"), target=target,
                 expand=args.num)
    tl, vl = load_dataset(ds, batch_size=args.batch_size, split=args.split)
    trainer = Trainer(model, max_epochs=args.max_epochs, lr=args.lr,
                      train_dir=args.train_dir)
    trainer.register_criterion(
        type("MagMSE", (), {"name": "MagMSE", "__call__":
             lambda self, yp, yt: jnp.mean((yp - yt) ** 2)})(), 1)
    H_init = jnp.abs(bq.response())[:, 0, 0]
    trainer.train(tl, vl)
    H_opt = jnp.abs(trainer.net.get_core().response())[:, 0, 0]
    plot_magnitude(
        {"target": target[0, :, 0], "init": H_init, "optimized": H_opt},
        os.path.join(args.train_dir, "e1_biquad_mag.png"),
        args.samplerate, nfft, title="Biquad bank trained to lowpass")
    print("e1 done; final loss", trainer.train_loss[-1])


if __name__ == "__main__":
    args = setup(example_parser(nfft=4096, max_epochs=3, lr=1e-2)
                 .parse_args())
    main(args)
