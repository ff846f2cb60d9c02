"""Biquad matching (reference examples/e7_biquad.py and the README toy):
train a 1x2 two-section highpass Biquad to a target magnitude response."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp

from _common import example_parser, plot_losses, plot_magnitude, setup


def main(args):
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.optimize import Dataset, Trainer, load_dataset
    from flamo_tpu.functional import highpass_filter, biquad2tf, signal_gallery

    nfft = args.nfft
    M = nfft // 2 + 1

    filt = dsp.Biquad(size=(1, 2), n_sections=2, filter_type="highpass",
                      nfft=nfft, fs=args.samplerate, requires_grad=True)
    model = system.Shell(core=filt, input_layer=dsp.FFT(nfft),
                         output_layer=dsp.Transform(lambda z: jnp.abs(z)))

    # target: product of two known highpass sections, 2 input channels
    b1, a1 = highpass_filter(fc=4000.0, gain=4.0, fs=args.samplerate)
    b2, a2 = highpass_filter(fc=8000.0, gain=-2.0, fs=args.samplerate)
    H = jnp.abs(biquad2tf(b1, a1, nfft) * biquad2tf(b2, a2, nfft))
    target = H[None, :, None]

    ds = Dataset(input=signal_gallery(1, M, 2, "impulse"), target=target,
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
        os.path.join(args.train_dir, "e7_biquad_mag.png"),
        args.samplerate, nfft, title="Biquad matched to 2-section target")
    plot_losses({"train": trainer.train_loss, "valid": trainer.valid_loss},
                os.path.join(args.train_dir, "e7_biquad_losses.png"))
    print("e7_biquad final loss:", trainer.train_loss[-1])
    assert len(trainer.train_loss) < 2 or \
        trainer.train_loss[-1] < trainer.train_loss[0] * 1.05


if __name__ == "__main__":
    args = setup(example_parser(nfft=4096, max_epochs=5, lr=1e-2)
                 .parse_args())
    main(args)
