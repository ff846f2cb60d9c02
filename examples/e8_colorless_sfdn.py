"""Colorless FDN with a ScatteringMatrix feedback (reference
examples/e8_colorless_sfdn.py)."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from _common import example_parser, setup


def main(args):
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.optimize import DatasetColorless, Trainer, load_dataset
    from flamo_tpu.optimize.loss import mse_loss

    nfft = args.nfft
    N = 4
    delays = (179, 211, 233, 251)
    alias_db = 30.0

    ig = dsp.Gain(size=(N, 1), nfft=nfft, requires_grad=True,
                  alias_decay_db=alias_db)
    og = dsp.Gain(size=(1, N), nfft=nfft, requires_grad=True,
                  alias_decay_db=alias_db)
    dl = dsp.parallelDelay(size=(N,), max_len=max(delays), nfft=nfft,
                           isint=True, alias_decay_db=alias_db)
    dl = dl.assign_value(dl.sample2s(jnp.asarray(delays, jnp.float32)))
    m_L = np.random.randint(1, min(delays) // 2, N)
    m_R = np.random.randint(1, min(delays) // 2, N)
    feedback = dsp.ScatteringMatrix(size=(4, N, N), nfft=nfft,
                                    gain_per_sample=1.0, sparsity=3,
                                    m_L=m_L, m_R=m_R,
                                    alias_decay_db=alias_db,
                                    requires_grad=True)
    loop = system.Recursion(fF=dl, fB=feedback)
    core = system.Series(OrderedDict({
        "input_gain": ig, "feedback_loop": loop, "output_gain": og}))
    model = system.Shell(core=core, input_layer=dsp.FFT(nfft),
                         output_layer=dsp.Transform(lambda z: jnp.abs(z)))

    dataset = DatasetColorless(input_shape=(1, nfft // 2 + 1, 1),
                               target_shape=(1, nfft // 2 + 1, 1),
                               expand=args.num)
    tl, vl = load_dataset(dataset, batch_size=args.batch_size,
                          split=args.split)
    trainer = Trainer(model, max_epochs=args.max_epochs, lr=args.lr,
                      train_dir=args.train_dir)
    trainer.register_criterion(mse_loss(nfft=nfft), 1)
    if args.scan:
        from flamo_tpu.optimize import stack_loader

        bx, bt = stack_loader(tl)
        history = trainer.fit_scan_epochs(bx, bt, n_epochs=args.max_epochs)
        print(f"fit_scan_epochs: loss {history[0]:.4f} -> "
              f"{history[-1]:.4f} over {len(history)} steps")
    else:
        trainer.train(tl, vl)
    print("e8_colorless_sfdn final loss:", trainer.train_loss[-1])
    assert np.isfinite(trainer.train_loss[-1])


if __name__ == "__main__":
    ap = example_parser(nfft=8192, max_epochs=3, num=16, batch_size=2,
                        lr=1e-3)
    ap.add_argument("--scan", action="store_true",
                    help="fused whole-epoch scan training (TPU fast path)")
    args = setup(ap.parse_args())
    main(args)
