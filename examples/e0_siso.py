"""SISO basics (reference examples/e0_siso.py): FFT/iFFT roundtrip, gains,
functional assign_value, and a FIR Filter trained to an exponential target."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from _common import example_parser, plot_losses, plot_signal, setup


def main(args):
    import flamo_tpu
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.optimize import Dataset, Trainer, load_dataset
    from flamo_tpu.optimize.loss import mse_loss
    from flamo_tpu.functional import signal_gallery

    nfft = args.nfft
    M = nfft // 2 + 1

    # 1) FFT / iFFT roundtrip
    x = signal_gallery(1, nfft, 1, "wgn")
    rt = dsp.iFFT(nfft)(dsp.FFT(nfft)(x))
    print("fft/ifft roundtrip err:", float(jnp.abs(rt - x).max()))
    assert float(jnp.abs(rt - x).max()) < 1e-3

    # 2) parallelGain on an impulse
    g = dsp.parallelGain(size=(1,), nfft=nfft)
    imp = signal_gallery(1, nfft, 1, "impulse")
    y = dsp.iFFT(nfft)(g(dsp.FFT(nfft)(imp)))
    print("parallelGain scales impulse:", float(y[0, 0, 0]),
          "==", float(g.param[0]))

    # 3) Gain + assign_value (functional)
    gm = dsp.Gain(size=(1, 1), nfft=nfft)
    gm = gm.assign_value(jnp.asarray([[0.5]]))
    assert float(gm.param[0, 0]) == 0.5

    # 4) train a FIR filter to match an exponential decay IR
    taps = 64
    target_ir = signal_gallery(1, nfft, 1, "exp", rate=400.0,
                               fs=args.samplerate)
    filt = dsp.Filter(size=(taps, 1, 1), nfft=nfft, requires_grad=True)
    model = system.Shell(core=filt, input_layer=dsp.FFT(nfft),
                         output_layer=dsp.iFFT(nfft))
    ds = Dataset(input=signal_gallery(1, nfft, 1, "impulse"),
                 target=target_ir, expand=args.num)
    train_loader, valid_loader = load_dataset(ds, batch_size=args.batch_size,
                                              split=args.split)
    trainer = Trainer(model, max_epochs=args.max_epochs, lr=1e-1,
                      train_dir=args.train_dir)
    trainer.register_criterion(
        type("TimeMSE", (), {"name": "TimeMSE", "__call__":
             lambda self, yp, yt: jnp.mean((yp - yt) ** 2)})(), 1)
    ir_init = trainer.net(signal_gallery(1, nfft, 1, "impulse"))
    trainer.train(train_loader, valid_loader)
    ir_opt = trainer.net(signal_gallery(1, nfft, 1, "impulse"))
    assert len(trainer.train_loss) < 2 or \
        trainer.train_loss[-1] < trainer.train_loss[0] or \
        trainer.train_loss[0] < 1e-6

    # plots: trained IR vs target (reference e0_siso.py plots), losses
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 3.5))
    ax.plot(np.asarray(ir_init)[0, :200, 0], label="Initial")
    ax.plot(np.asarray(ir_opt)[0, :200, 0], label="Optimized")
    ax.plot(np.asarray(target_ir)[0, :200, 0], "--", label="Target")
    ax.grid(True)
    ax.legend()
    ax.set_xlabel("Samples")
    ax.set_title("FIR trained to an exponential-decay IR")
    fig.tight_layout()
    fig.savefig(os.path.join(args.train_dir, "e0_fir_ir.png"))
    plt.close(fig)
    plot_losses({"train": trainer.train_loss, "valid": trainer.valid_loss},
                os.path.join(args.train_dir, "e0_losses.png"))
    print("e0 done; final loss", trainer.train_loss[-1])


if __name__ == "__main__":
    args = setup(example_parser(nfft=4096, max_epochs=3).parse_args())
    main(args)
