"""FDN matched to a room impulse response (reference examples/e8_fdn.py).

The reference fits a measured Arni RIR; measured data is not shipped here,
so by default a synthetic exponentially-decaying noise RIR (WGN reverb) is
the target — pass ``--rir path.wav`` to fit a measured one.  Attenuation is
a trainable delay-scaled GEQ; losses are multi-scale spectral + sparsity."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import argparse
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from _common import example_parser, setup


def main(args):
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.auxiliary.reverb import parallelFDNGEQ
    from flamo_tpu.optimize import Dataset, Trainer, load_dataset
    from flamo_tpu.optimize.loss import mss_loss, sparsity_loss
    from flamo_tpu.functional import WGN_reverb, signal_gallery

    nfft = args.nfft
    N = 4
    delays = (179, 211, 233, 251)
    alias_db = 30.0

    if args.rir:
        from flamo_tpu.utils import load_audio

        rir, fs = load_audio(args.rir)
        rir = jnp.asarray(rir[:nfft, :1])
        rir = jnp.pad(rir, ((0, nfft - rir.shape[0]), (0, 0)))
    else:
        rir = WGN_reverb((1,), t60=0.25, samplerate=args.samplerate)[:nfft]
        rir = jnp.pad(rir, ((0, max(0, nfft - rir.shape[0])), (0, 0)))
    target = rir[None, :, :]  # (1, nfft, 1)

    ig = dsp.Gain(size=(N, 1), nfft=nfft, requires_grad=True,
                  alias_decay_db=alias_db)
    og = dsp.Gain(size=(1, N), nfft=nfft, requires_grad=True,
                  alias_decay_db=alias_db)
    dl = dsp.parallelDelay(size=(N,), max_len=max(delays), nfft=nfft,
                           isint=True, alias_decay_db=alias_db)
    dl = dl.assign_value(dl.sample2s(jnp.asarray(delays, jnp.float32)))
    if args.attenuation == "geq":
        atten = parallelFDNGEQ(octave_interval=1, nfft=nfft,
                               fs=args.samplerate,
                               delays=jnp.asarray(delays),
                               requires_grad=True,
                               alias_decay_db=alias_db)
    elif args.attenuation == "accurate_geq":
        from flamo_tpu.auxiliary.reverb import parallelFDNAccurateGEQ

        atten = parallelFDNAccurateGEQ(octave_interval=1, nfft=nfft,
                                       fs=args.samplerate,
                                       delays=jnp.asarray(delays),
                                       alias_decay_db=alias_db)
    elif args.attenuation == "peq":
        from flamo_tpu.auxiliary.reverb import parallelFDNPEQ

        atten = parallelFDNPEQ(n_bands=6, delays=jnp.asarray(delays),
                               nfft=nfft, fs=args.samplerate,
                               requires_grad=True,
                               alias_decay_db=alias_db)
    else:  # shelving
        from flamo_tpu.auxiliary.reverb import parallelFirstOrderShelving

        atten = parallelFirstOrderShelving(nfft=nfft, fs=args.samplerate,
                                           delays=jnp.asarray(delays),
                                           requires_grad=True,
                                           alias_decay_db=alias_db)
    fb = dsp.Matrix(size=(N, N), nfft=nfft, matrix_type="orthogonal",
                    requires_grad=True, alias_decay_db=alias_db)
    loop = system.Recursion(
        fF=system.Series(OrderedDict({"delays": dl, "attenuation": atten})),
        fB=fb)
    core = system.Series(OrderedDict({
        "input_gain": ig, "feedback_loop": loop, "output_gain": og}))
    model = system.Shell(core=core, input_layer=dsp.FFT(nfft),
                         output_layer=dsp.iFFTAntiAlias(
                             nfft=nfft, alias_decay_db=alias_db))

    ds = Dataset(input=signal_gallery(1, nfft, 1, "impulse"), target=target,
                 expand=args.num)
    tl, vl = load_dataset(ds, batch_size=args.batch_size, split=args.split)
    trainer = Trainer(model, max_epochs=args.max_epochs, lr=args.lr,
                      train_dir=args.train_dir)
    trainer.register_criterion(
        mss_loss(nfft=[256, 512, 1024], sample_rate=args.samplerate), 1)
    trainer.register_criterion(sparsity_loss(), 0.2, requires_model=True)
    if args.scan:
        # TPU fast path: fuse the whole epoch (all batches) into one
        # dispatched lax.scan program — numerically lockstep with train()
        from flamo_tpu.optimize import stack_loader

        bx, bt = stack_loader(tl)
        history = trainer.fit_scan_epochs(bx, bt, n_epochs=args.max_epochs)
        trainer.train_loss = [float(history[0]), float(history[-1])]
        print(f"fit_scan_epochs: loss {history[0]:.4f} -> "
              f"{history[-1]:.4f} over {len(history)} steps")
    else:
        trainer.train(tl, vl)
    print("e8_fdn final loss:", trainer.train_loss[-1])
    assert np.isfinite(trainer.train_loss[-1])


if __name__ == "__main__":
    ap = example_parser(nfft=8192, max_epochs=3, num=16, batch_size=2,
                        lr=1e-3)
    ap.add_argument("--rir", type=str, default=None,
                    help="path to a measured RIR wav (optional)")
    ap.add_argument("--attenuation", type=str, default="geq",
                    choices=["geq", "accurate_geq", "peq", "shelving"])
    ap.add_argument("--scan", action="store_true",
                    help="fused whole-epoch scan training (TPU fast path)")
    args = setup(ap.parse_args())
    main(args)
