"""Colorless FDN with a ScatteringMatrix feedback (reference
examples/e8_colorless_sfdn.py): N=6, delays [997..2099], paraunitary
scattering feedback (4 stages, sparsity 3, random m_L/m_R), trained with
masked_mse (2000-bin random partitions, regenerated) + 0.2 * sparsity."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from _common import example_parser, setup


def main(args):
    import flamo_tpu
    from flamo_tpu.models import build_colorless_sfdn, sfdn_fit
    from flamo_tpu.optimize import DatasetColorless, Trainer, load_dataset
    from flamo_tpu.optimize.loss import masked_mse_loss, sparsity_loss
    from flamo_tpu.utils import host_eager, save_audio

    nfft = args.nfft
    # reference scenario (e8_colorless_sfdn.py:29-31); scale the delays
    # down only for tiny smoke nffts
    delays = (997, 1153, 1327, 1559, 1801, 2099) if nfft >= 8192 else \
        (97, 107, 113, 127, 131, 137)
    n_samples = min(2000, (nfft // 2 + 1) // 4)
    with host_eager():  # eager construction on CPU (CLAUDE.md)
        model = build_colorless_sfdn(nfft=nfft, delays=delays,
                                     solve_method=args.solve)

    def _render_ir(m):
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
    trainer.register_criterion(
        masked_mse_loss(nfft=nfft, n_samples=n_samples, n_sets=1,
                        regenerate_mask=True), 1)
    trainer.register_criterion(sparsity_loss(), 0.2, requires_model=True)
    n_steps = args.max_epochs * args.num
    trained = None
    use_fast = args.fast == "fused" or (
        args.fast == "auto" and jax.default_backend() != "cpu")
    if use_fast:
        # paved-road fast path: models.sfdn_fit scans the whole masked
        # objective in jitted chunks — masked=True solves the closed
        # loop only at each step's masked bins (identical objective,
        # lockstep parity pinned in tests/test_models.py), so the gate
        # is just a finite + decreasing loss check
        try:
            trained, history = sfdn_fit(model, n_steps=n_steps, lr=args.lr,
                                        n_samples=n_samples, masked=True)
            if np.isfinite(history).all() and history[-1] <= history[0]:
                trainer.net = trained
                trainer.train_loss = [float(history[0]),
                                      float(history[-1])]
                print(f"fast path: {len(history)} scanned steps, loss "
                      f"{history[0]:.4f} -> {history[-1]:.4f}")
            else:
                trained = None
                print("fast path produced a non-decreasing/non-finite "
                      "loss — falling back")
        except Exception as e:
            if args.fast == "fused":
                raise
            trained = None
            print(f"fast path unavailable ({type(e).__name__}: {e}) — "
                  "falling back")
    if trained is None:
        trainer.train(tl, vl)

    ir_optim = _render_ir(trainer.net)
    save_audio(os.path.join(args.train_dir, "ir_optim.wav"),
               ir_optim / np.abs(ir_optim).max(), fs=args.samplerate)

    # save raw parameters (.mat like the reference, save_fdn_params)
    from scipy.io import savemat

    core = trainer.net.get_core()
    ff = core.feedback_loop.feedforward
    savemat(os.path.join(args.train_dir, "parameters_optim.mat"), {
        "A": np.asarray(core.feedback_loop.feedback.param),
        "B": np.asarray(core.input_gain.param),
        "C": np.asarray(core.output_gain.param),
        "m": np.asarray(ff.s2sample(ff.map(ff.param))),
    })
    print("e8_colorless_sfdn final loss:", trainer.train_loss[-1])
    assert np.isfinite(trainer.train_loss[-1])


if __name__ == "__main__":
    ap = example_parser(nfft=8192, max_epochs=3, num=16, batch_size=2,
                        lr=1e-3)
    ap.add_argument("--fast", type=str, default="auto",
                    choices=["auto", "fused", "graph"],
                    help="'auto' trains through the jitted whole-schedule "
                         "scan (models.sfdn_fit) on accelerators, "
                         "'fused' forces it (raises on failure), "
                         "'graph' keeps the per-step Trainer path")
    ap.add_argument("--solve", type=str, default="ge_cached",
                    choices=["ge", "ge_nopivot", "ge_cached", "lu",
                             "pallas"],
                    help="closed-loop solve kernel for the full (M, N, N) "
                         "frequency-dependent scattering loop; 'pallas' "
                         "is the generic Mosaic elimination kernel")
    args = setup(ap.parse_args())
    main(args)
