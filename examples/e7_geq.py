"""GEQ matching (reference examples/e7_geq.py): trainable GEQ and the
non-learnable AccurateGEQ against a command-gain target."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from _common import example_parser, plot_magnitude, setup


def main(args):
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.optimize import Dataset, Trainer, load_dataset
    from flamo_tpu.functional import signal_gallery

    nfft = args.nfft
    M = nfft // 2 + 1

    # target from a known GEQ configuration
    target_geq = dsp.GEQ(size=(1, 1), octave_interval=1, nfft=nfft,
                         fs=args.samplerate)
    target = jnp.abs(target_geq.response())[None, :, :, 0]

    filt = dsp.GEQ(size=(1, 1), octave_interval=1, nfft=nfft,
                   fs=args.samplerate, requires_grad=True)
    model = system.Shell(core=filt, input_layer=dsp.FFT(nfft),
                         output_layer=dsp.Transform(lambda z: jnp.abs(z)))
    ds = Dataset(input=signal_gallery(1, M, 1, "impulse"), target=target,
                 expand=args.num)
    tl, vl = load_dataset(ds, batch_size=args.batch_size, split=args.split)
    trainer = Trainer(model, max_epochs=args.max_epochs, lr=args.lr,
                      train_dir=args.train_dir)
    trainer.register_criterion(
        type("MagMSE", (), {"name": "MagMSE", "__call__":
             lambda self, yp, yt: jnp.mean((yp - yt) ** 2)})(), 1)
    H_init = jnp.abs(filt.response())[:, 0, 0]
    trainer.train(tl, vl)
    H_opt = jnp.abs(trainer.net.get_core().response())[:, 0, 0]
    plot_magnitude(
        {"target": target[0, :, 0], "init": H_init, "optimized": H_opt},
        os.path.join(args.train_dir, "e7_geq_mag.png"),
        args.samplerate, nfft, title="GEQ matched to target command gains")
    print("e7_geq final loss:", trainer.train_loss[-1])

    # AccurateGEQ: design-time fit, no training
    ag = dsp.parallelAccurateGEQ(size=(1,), octave_interval=1, nfft=nfft,
                                 fs=args.samplerate)
    mag = np.abs(np.asarray(ag.response()))[:, 0]
    print("accurate GEQ magnitude range (dB):",
          float(20 * np.log10(mag.min())), "-",
          float(20 * np.log10(mag.max())))
    plot_magnitude({"AccurateGEQ": mag},
                   os.path.join(args.train_dir, "e7_accurate_geq_mag.png"),
                   args.samplerate, nfft, title="AccurateGEQ design")


if __name__ == "__main__":
    args = setup(example_parser(nfft=4096, max_epochs=3, lr=5e-2)
                 .parse_args())
    main(args)
