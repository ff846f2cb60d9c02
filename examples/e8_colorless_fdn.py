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

    from flamo_tpu.utils import host_eager

    nfft = args.nfft
    delays = (887, 911, 941, 1699, 1951, 2053) if nfft >= 8192 else \
        (89, 97, 107, 113, 127, 131)
    with host_eager():  # eager construction on CPU (CLAUDE.md)
        model = build_colorless_fdn(nfft=nfft, delays=delays,
                                    solve_method=args.solve)

    def _render_ir(m):
        # jitted render: one compile instead of per-op tunnel round-trips
        return np.asarray(jax.jit(
            lambda mm: mm.get_time_response(fs=args.samplerate))(m)
        ).squeeze()

    ir_init = _render_ir(model)
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
    n_steps = args.max_epochs * args.num
    trained = None
    use_fast = args.fast == "fused" or (
        args.fast == "auto" and jax.default_backend() != "cpu")
    if use_fast:
        # paved-road fast path: the whole objective (solve, projections,
        # mse loss AND its cotangents) in ONE fused Pallas grid pass
        # (models.colorless_fit, ~19k steps/s on TPU — BENCH.md), gated
        # on init-loss parity against the graph criterion (same pattern
        # as bench.py's '--solve auto' ladder)
        from flamo_tpu.models import (colorless_fit, colorless_loss,
                                      colorless_loss_fused_step)

        x = jnp.zeros((1, nfft // 2 + 1, 1)).at[:, 0, :].set(1.0)
        t = jnp.ones((1, nfft // 2 + 1, 1))
        try:
            graph0 = float(jax.jit(colorless_loss)(model, x, t))
            fused0 = float(jax.jit(
                lambda m, xx, tt: colorless_loss_fused_step(
                    m, xx, tt, pivot=False))(model, x, t))
            rel = abs(fused0 - graph0) / max(1e-9, abs(graph0))
            if rel < 5e-3:
                trained, history = colorless_fit(
                    model, n_steps=n_steps, lr=args.lr)
                if np.isfinite(history).all() \
                        and history[-1] <= history[0]:
                    trainer.net = trained
                    trainer.train_loss = [float(history[0]),
                                          float(history[-1])]
                    print(f"fast path: {len(history)} fused steps, loss "
                          f"{history[0]:.4f} -> {history[-1]:.4f} "
                          f"(graph parity rel={rel:.1e})")
                else:
                    trained = None
                    print("fast path produced a non-decreasing/non-"
                          "finite loss — falling back")
            else:
                print(f"fast path parity gate failed (rel={rel:.1e}) — "
                      "falling back")
        except Exception as e:
            if args.fast == "fused":
                raise
            trained = None
            print(f"fast path unavailable ({type(e).__name__}: {e}) — "
                  "falling back")
    if trained is None and (args.scan or use_fast):
        # TPU fast path: K optimizer steps fused per dispatch (exact for
        # the colorless dataset, which repeats one (input, target) pair)
        x = jnp.zeros((1, nfft // 2 + 1, 1)).at[:, 0, :].set(1.0)
        t = jnp.ones((1, nfft // 2 + 1, 1))
        history = trainer.fit_scan(x, t, n_steps=n_steps)
        trainer.train_loss = [float(history[0]), float(history[-1])]
        print(f"fit_scan: loss {history[0]:.4f} -> {history[-1]:.4f} "
              f"over {len(history)} steps")
    elif trained is None:
        trainer.train(tl, vl)

    ir_optim = _render_ir(trainer.net)
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
    ap.add_argument("--fast", type=str, default="auto",
                    choices=["auto", "fused", "graph"],
                    help="'auto' trains through the fused Pallas step "
                         "kernel on accelerators (parity-gated against "
                         "the graph criterion, Trainer fallback), "
                         "'fused' forces it (raises on failure), "
                         "'graph' keeps the module-graph path")
    ap.add_argument("--solve", type=str, default="ge_cached",
                    choices=["ge", "ge_nopivot", "ge_cached", "lu",
                             "pallas"],
                    help="closed-loop solve kernel; 'pallas' is the fused "
                         "Mosaic kernel (fastest on TPU; on CPU it runs "
                         "through the slow Pallas interpreter — "
                         "validation only)")
    args = setup(ap.parse_args())
    main(args)
