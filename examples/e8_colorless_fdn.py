"""Colorless FDN — the north-star workload (reference
examples/e8_colorless_fdn.py): N=6 FDN, delays [887..2053], 30 dB alias
decay, orthogonal feedback, flat-magnitude target with mse + sparsity."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from _common import example_parser, setup


def main(args):
    import flamo_tpu
    from flamo_tpu.models import build_colorless_fdn
    from flamo_tpu.optimize import DatasetColorless, Trainer, load_dataset
    from flamo_tpu.optimize.loss import mse_loss, sparsity_loss
    from flamo_tpu.utils import save_audio

    nfft = args.nfft
    delays = (887, 911, 941, 1699, 1951, 2053) if nfft >= 8192 else \
        (89, 97, 107, 113, 127, 131)
    model = build_colorless_fdn(nfft=nfft, delays=delays,
                                solve_method=args.solve)

    ir_init = np.asarray(
        model.get_time_response(fs=args.samplerate)).squeeze()
    save_audio(os.path.join(args.train_dir, "ir_init.wav"),
               ir_init / np.abs(ir_init).max(), fs=args.samplerate)

    dataset = DatasetColorless(input_shape=(1, nfft // 2 + 1, 1),
                               target_shape=(1, nfft // 2 + 1, 1),
                               expand=args.num)
    tl, vl = load_dataset(dataset, batch_size=args.batch_size,
                          split=args.split)
    trainer = Trainer(model, max_epochs=args.max_epochs, lr=args.lr,
                      train_dir=args.train_dir)
    trainer.register_criterion(mse_loss(nfft=nfft), 1)
    trainer.register_criterion(sparsity_loss(), 0.2, requires_model=True)
    if args.scan:
        # TPU fast path: K optimizer steps fused per dispatch (exact for
        # the colorless dataset, which repeats one (input, target) pair)
        import jax.numpy as _jnp

        x = _jnp.zeros((1, nfft // 2 + 1, 1)).at[:, 0, :].set(1.0)
        t = _jnp.ones((1, nfft // 2 + 1, 1))
        history = trainer.fit_scan(x, t, n_steps=args.max_epochs * args.num)
        trainer.train_loss = [float(history[0]), float(history[-1])]
        print(f"fit_scan: loss {history[0]:.4f} -> {history[-1]:.4f} "
              f"over {len(history)} steps")
    else:
        trainer.train(tl, vl)

    ir_optim = np.asarray(
        trainer.net.get_time_response(fs=args.samplerate)).squeeze()
    save_audio(os.path.join(args.train_dir, "ir_optim.wav"),
               ir_optim / np.abs(ir_optim).max(), fs=args.samplerate)

    # save raw parameters (.mat like the reference)
    from scipy.io import savemat

    core = trainer.net.get_core()
    savemat(os.path.join(args.train_dir, "parameters_optim.mat"), {
        "A": np.asarray(core.feedback_loop.feedback.param),
        "B": np.asarray(core.input_gain.param),
        "C": np.asarray(core.output_gain.param),
        "m": np.asarray(core.feedback_loop.feedforward.param),
    })
    print("e8_colorless_fdn final loss:", trainer.train_loss[-1])
    assert trainer.train_loss[-1] <= trainer.train_loss[0]
    assert np.isfinite(trainer.train_loss[-1])


if __name__ == "__main__":
    ap = example_parser(nfft=8192, max_epochs=5, num=32, batch_size=4,
                        lr=1e-3)
    ap.add_argument("--scan", action="store_true",
                    help="fused multi-step scan training (TPU fast path)")
    ap.add_argument("--solve", type=str, default="ge_cached",
                    choices=["ge", "ge_nopivot", "ge_cached", "lu",
                             "pallas"],
                    help="closed-loop solve kernel; 'pallas' is the fused "
                         "Mosaic kernel (fastest on TPU; on CPU it runs "
                         "through the slow Pallas interpreter — "
                         "validation only)")
    args = setup(ap.parse_args())
    main(args)
