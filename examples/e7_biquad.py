"""Biquad matching (reference examples/e7_biquad.py): two scenarios.

* ``biquad`` — reference ``example_biquad`` (e7_biquad.py:15-122): train a
  MIMO two-section highpass Biquad against a random highpass-cascade
  target magnitude (fc ~ U(0, fs/2), gain ~ U(-1, 1) dB).
* ``parallel_biquad`` — reference ``example_parallel_biquad`` (:124-233):
  the diagonal variant.

Plus the original fixed-target demo (``fixed``): a 1x2 highpass biquad
trained to a known 2-section cascade.
"""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from _common import (example_parser, plot_losses, plot_magnitude, setup,
                     train_filter_to_target)


def _random_highpass_target(args, key, shape):
    """Random highpass cascade, prod over sections
    (reference e7_biquad.py:26-36)."""
    from flamo_tpu.functional import highpass_filter

    k1, k2 = jax.random.split(key)
    fc = args.samplerate / 2 * jax.random.uniform(k1, shape)
    gain = jax.random.uniform(k2, shape, minval=-1.0, maxval=1.0)
    b, a = highpass_filter(fc=fc, gain=gain, fs=args.samplerate)
    B = np.fft.rfft(np.asarray(b), args.nfft, axis=0)
    A = np.fft.rfft(np.asarray(a), args.nfft, axis=0)
    return jnp.asarray(np.prod(B, axis=1) / np.prod(A, axis=1))


def _impulse_target(args, target_filter, in_ch, mimo):
    from flamo_tpu.functional import signal_gallery

    x = signal_gallery(1, n_samples=args.nfft, n=in_ch,
                       signal_type="impulse", fs=args.samplerate)
    X = jnp.fft.rfft(x, args.nfft, axis=1)
    if mimo:
        return jnp.abs(jnp.einsum("...ji,...i->...j", target_filter, X))
    return jnp.abs(jnp.einsum("...i,...i->...i", target_filter, X))


def example_biquad(args):
    from flamo_tpu.processor import dsp

    in_ch, out_ch = 1, 2
    n_sections = 2
    target_filter = _random_highpass_target(
        args, jax.random.PRNGKey(args.seed), (n_sections, out_ch, in_ch))
    target_mag = _impulse_target(args, target_filter, in_ch, mimo=True)

    filt = dsp.Biquad(size=(out_ch, in_ch), n_sections=n_sections,
                      filter_type="highpass", nfft=args.nfft,
                      fs=args.samplerate, requires_grad=True,
                      alias_decay_db=30)
    train_filter_to_target(args, filt, target_mag, in_ch, tag="biquad")


def example_parallel_biquad(args):
    from flamo_tpu.processor import dsp

    ch = 2
    n_sections = 2
    target_filter = _random_highpass_target(
        args, jax.random.PRNGKey(args.seed + 1), (n_sections, ch))
    target_mag = _impulse_target(args, target_filter, ch, mimo=False)

    filt = dsp.parallelBiquad(size=(ch,), n_sections=n_sections,
                              filter_type="highpass", nfft=args.nfft,
                              fs=args.samplerate, requires_grad=True,
                              alias_decay_db=30)
    train_filter_to_target(args, filt, target_mag, ch,
                           tag="parallel_biquad")


def example_fixed(args):
    """The original 1x2 fixed-target demo with loss curves."""
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.optimize import Dataset, Trainer, load_dataset
    from flamo_tpu.functional import (highpass_filter, biquad2tf,
                                      signal_gallery)
    from _common import PlainMSE

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
    trainer.register_criterion(PlainMSE(), 1)
    H_init = jnp.abs(filt.response())[:, 0, 0]
    trainer.train(tl, vl)
    H_opt = jnp.abs(trainer.net.get_core().response())[:, 0, 0]
    plot_magnitude(
        {"target": target[0, :, 0], "init": H_init, "optimized": H_opt},
        os.path.join(args.train_dir, "e7_biquad_mag.png"),
        args.samplerate, nfft, title="Biquad matched to 2-section target")
    plot_losses({"train": trainer.train_loss, "valid": trainer.valid_loss},
                os.path.join(args.train_dir, "e7_biquad_losses.png"))
    print("e7_biquad[fixed] final loss:", trainer.train_loss[-1])
    assert len(trainer.train_loss) < 2 or \
        trainer.train_loss[-1] < trainer.train_loss[0] * 1.05


def main(args):
    scenarios = {
        "biquad": example_biquad,
        "parallel_biquad": example_parallel_biquad,
        "fixed": example_fixed,
    }
    names = list(scenarios) if args.scenario == "all" else [args.scenario]
    for name in names:
        print(f"--- e7_biquad scenario: {name} ---")
        scenarios[name](args)


if __name__ == "__main__":
    ap = example_parser(nfft=4096, max_epochs=5, lr=1e-2, num=16,
                        batch_size=2)
    ap.add_argument("--scenario", type=str, default="all",
                    choices=["biquad", "parallel_biquad", "fixed", "all"])
    args = setup(ap.parse_args())
    main(args)
