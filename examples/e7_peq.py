"""PEQ matching (reference examples/e7_peq.py): train a parametric EQ to a
target magnitude response."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp

from _common import example_parser, plot_magnitude, setup


def main(args):
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.optimize import Dataset, Trainer, load_dataset
    from flamo_tpu.functional import signal_gallery

    nfft = args.nfft
    M = nfft // 2 + 1

    for design in ["biquad", "svf"]:
        filt = dsp.PEQ(size=(1, 1), n_bands=6, design=design, nfft=nfft,
                       fs=args.samplerate, requires_grad=True)
        model = system.Shell(core=filt, input_layer=dsp.FFT(nfft),
                             output_layer=dsp.Transform(lambda z: jnp.abs(z)))
        target_src = dsp.PEQ(size=(1, 1), n_bands=6, design=design,
                             nfft=nfft, fs=args.samplerate)
        target = jnp.abs(target_src.response())[None, :, :, 0]
        ds = Dataset(input=signal_gallery(1, M, 1, "impulse"), target=target,
                     expand=args.num)
        tl, vl = load_dataset(ds, batch_size=args.batch_size,
                              split=args.split)
        trainer = Trainer(model, max_epochs=args.max_epochs, lr=args.lr,
                          train_dir=args.train_dir)
        trainer.register_criterion(
            type("MagMSE", (), {"name": "MagMSE", "__call__":
                 lambda self, yp, yt: jnp.mean((yp - yt) ** 2)})(), 1)
        H_init = jnp.abs(filt.response())[:, 0, 0]
        trainer.train(tl, vl)
        H_opt = jnp.abs(trainer.net.get_core().response())[:, 0, 0]
        plot_magnitude(
            {"target": target[0, :, 0], "init": H_init,
             "optimized": H_opt},
            os.path.join(args.train_dir, f"e7_peq_{design}_mag.png"),
            args.samplerate, nfft,
            title=f"PEQ ({design}) matched to target")
        print(f"e7_peq[{design}] final loss:", trainer.train_loss[-1])


if __name__ == "__main__":
    args = setup(example_parser(nfft=4096, max_epochs=3, lr=1e-2)
                 .parse_args())
    main(args)
