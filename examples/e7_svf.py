"""SVF matching (reference examples/e7_svf.py): train cascaded SVF sections
to a target magnitude response."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp

from _common import example_parser, plot_magnitude, setup


def main(args):
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.optimize import Dataset, Trainer, load_dataset
    from flamo_tpu.functional import svf, biquad2tf, signal_gallery

    nfft = args.nfft
    M = nfft // 2 + 1

    filt = dsp.SVF(size=(1, 1), n_sections=2, filter_type="lowshelf",
                   nfft=nfft, fs=args.samplerate, requires_grad=True)
    model = system.Shell(core=filt, input_layer=dsp.FFT(nfft),
                         output_layer=dsp.Transform(lambda z: jnp.abs(z)))

    b, a = svf(jnp.asarray(800.0), jnp.asarray(1.0),
               G=jnp.asarray(10 ** (-6 / 20)), filter_type="lowshelf",
               fs=args.samplerate)
    target = jnp.abs(biquad2tf(b, a, nfft))[None, :, None]

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
        os.path.join(args.train_dir, "e7_svf_mag.png"),
        args.samplerate, nfft, title="SVF matched to lowshelf target")
    print("e7_svf final loss:", trainer.train_loss[-1])


if __name__ == "__main__":
    args = setup(example_parser(nfft=4096, max_epochs=5, lr=5e-2)
                 .parse_args())
    main(args)
