"""GEQ matching (reference examples/e7_geq.py): four scenarios.

* ``geq`` — reference ``example_geq`` (e7_geq.py:16-124): train MIMO GEQ
  command gains to match an accurate-GEQ-designed target magnitude.
* ``parallel_geq`` — reference ``example_parallel_geq`` (:126-234): same
  with the diagonal (parallel) GEQ.
* ``accurate_geq`` — reference ``example_accurate_geq`` (:234-300):
  non-trainable AccurateGEQ assigned the target gains directly; its
  design-time bounded-LS fit should land on the target response without
  any training.
* ``accurate_parallel_geq`` — reference ``example_accurate_parallel_geq``
  (:302-367): the diagonal variant.

Each scenario writes the reference's ``magnitude_response.png`` artifact
(two channels: target / init / optimized curves).
"""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from _common import (example_parser, plot_two_channel, setup,
                     train_filter_to_target)


def _design_target_filter(args, target_gains):
    """Design an accurate-GEQ SOS cascade per channel from dB gains and
    return its complex response, prod(rfft(b))/prod(rfft(a))
    (reference e7_geq.py:27-47)."""
    from flamo_tpu.auxiliary.eq import accurate_geq, eq_freqs

    center_freq, shelving_crossover = eq_freqs(interval=1)
    gains = np.asarray(target_gains)
    chans = gains.reshape(gains.shape[0], -1)
    Bs, As = [], []
    for c in range(chans.shape[1]):
        b, a = accurate_geq(20 * np.log10(chans[:, c]),
                            center_freq=np.asarray(center_freq),
                            shelving_crossover=np.asarray(shelving_crossover),
                            fs=args.samplerate)
        Bs.append(np.asarray(b))
        As.append(np.asarray(a))
    b = np.stack(Bs, -1).reshape((3, -1) + gains.shape[1:])
    a = np.stack(As, -1).reshape((3, -1) + gains.shape[1:])
    B = np.fft.rfft(b, args.nfft, axis=0)
    A = np.fft.rfft(a, args.nfft, axis=0)
    A[A == 0] = 1e-12
    return jnp.asarray(np.prod(B, axis=1) / np.prod(A, axis=1))


def _apply_target(args, target_filter, in_ch, mimo):
    """Target magnitude: the designed filter applied to an impulse."""
    from flamo_tpu.functional import signal_gallery

    x = signal_gallery(1, n_samples=args.nfft, n=in_ch,
                       signal_type="impulse", fs=args.samplerate)
    X = jnp.fft.rfft(x, args.nfft, axis=1)
    if mimo:
        return jnp.abs(jnp.einsum("...ji,...i->...j", target_filter, X))
    return jnp.abs(jnp.einsum("...i,...i->...i", target_filter, X))


def _train_geq(args, filt, target_filter, in_ch, tag, mimo):
    target_mag = _apply_target(args, target_filter, in_ch, mimo)
    train_filter_to_target(args, filt, target_mag, in_ch, tag=tag)


def example_geq(args):
    """Train MIMO GEQ command gains against the designed target."""
    from flamo_tpu.processor import dsp
    from flamo_tpu.auxiliary.eq import eq_freqs

    in_ch, out_ch = 1, 2
    center_freq, _ = eq_freqs(interval=1)
    key = jax.random.PRNGKey(args.seed)
    target_gains = 10 ** (-6 / 20) + (10 ** (6 / 20) - 10 ** (-6 / 20)) * \
        jax.random.uniform(key, (len(center_freq) + 2, out_ch, in_ch))
    target_filter = _design_target_filter(args, target_gains)

    filt = dsp.GEQ(size=(out_ch, in_ch), octave_interval=1, nfft=args.nfft,
                   fs=args.samplerate, requires_grad=True,
                   alias_decay_db=30)
    _train_geq(args, filt, target_filter, in_ch, tag="geq", mimo=True)


def example_parallel_geq(args):
    """Train diagonal GEQ command gains against the designed target."""
    from flamo_tpu.processor import dsp
    from flamo_tpu.auxiliary.eq import eq_freqs

    ch = 2
    center_freq, _ = eq_freqs(interval=1)
    key = jax.random.PRNGKey(args.seed + 1)
    target_gains = 10 ** (-12 / 20) + (10 ** (12 / 20) - 10 ** (-12 / 20)) * \
        jax.random.uniform(key, (len(center_freq) + 2, ch))
    target_filter = _design_target_filter(args, target_gains)

    filt = dsp.parallelGEQ(size=(ch,), octave_interval=1, nfft=args.nfft,
                           fs=args.samplerate, requires_grad=True,
                           alias_decay_db=30)
    _train_geq(args, filt, target_filter, ch, tag="parallel_geq",
               mimo=False)


def _accurate_common(args, filt, target_gains, in_ch, tag, mimo):
    """Assign the gains, render the design, and compare to the target."""
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.functional import signal_gallery

    target_filter = _design_target_filter(args, target_gains)
    filt = filt.assign_value(jnp.asarray(target_gains))
    model = system.Shell(core=filt, input_layer=dsp.FFT(args.nfft),
                         output_layer=dsp.Transform(jnp.abs))
    filter_response = model.get_freq_response()

    target = _apply_target(args, target_filter, in_ch, mimo)

    plot_two_channel(
        [{"Target": (target[0, :, c], "-"),
          "Filter response": (filter_response[0, :, c], "--")}
         for c in range(target.shape[-1])],
        os.path.join(args.train_dir, f"magnitude_response_{tag}.png"))

    # the design is deterministic: the module's cached SOS must reproduce
    # the externally designed target response exactly
    err = float(jnp.max(jnp.abs(target - jnp.abs(filter_response))))
    rng = float(jnp.max(target))
    print(f"e7_geq[{tag}] max |target - design| = {err:.2e} "
          f"(target range {rng:.2f})")
    assert err < 1e-2 * max(rng, 1.0), err


def example_accurate_geq(args):
    """AccurateGEQ (MIMO): design-time fit reproduces the target."""
    from flamo_tpu.processor import dsp
    from flamo_tpu.auxiliary.eq import eq_freqs

    in_ch, out_ch = 1, 2
    center_freq, _ = eq_freqs(interval=1)
    key = jax.random.PRNGKey(args.seed + 2)
    target_gains = 10 ** (-12 / 20) + (10 ** (12 / 20) - 10 ** (-12 / 20)) * \
        jax.random.uniform(key, (len(center_freq) + 2, out_ch, in_ch))
    filt = dsp.AccurateGEQ(size=(out_ch, in_ch), octave_interval=1,
                           nfft=args.nfft, fs=args.samplerate,
                           alias_decay_db=0)
    _accurate_common(args, filt, target_gains, in_ch, tag="accurate_geq",
                     mimo=True)


def example_accurate_parallel_geq(args):
    """parallelAccurateGEQ: diagonal design-time fit."""
    from flamo_tpu.processor import dsp
    from flamo_tpu.auxiliary.eq import eq_freqs

    ch = 2
    center_freq, _ = eq_freqs(interval=1)
    key = jax.random.PRNGKey(args.seed + 3)
    target_gains = 10 ** (-12 / 20) + (10 ** (12 / 20) - 10 ** (-12 / 20)) * \
        jax.random.uniform(key, (len(center_freq) + 2, ch))
    filt = dsp.parallelAccurateGEQ(size=(ch,), octave_interval=1,
                                   nfft=args.nfft, fs=args.samplerate,
                                   alias_decay_db=0)
    _accurate_common(args, filt, target_gains, ch,
                     tag="accurate_parallel_geq", mimo=False)


def main(args):
    scenarios = {
        "geq": example_geq,
        "parallel_geq": example_parallel_geq,
        "accurate_geq": example_accurate_geq,
        "accurate_parallel_geq": example_accurate_parallel_geq,
    }
    names = list(scenarios) if args.scenario == "all" else [args.scenario]
    for name in names:
        print(f"--- e7_geq scenario: {name} ---")
        scenarios[name](args)


if __name__ == "__main__":
    ap = example_parser(nfft=4096, max_epochs=3, lr=5e-2, num=16,
                        batch_size=2)
    ap.add_argument("--scenario", type=str, default="all",
                    choices=["geq", "parallel_geq", "accurate_geq",
                             "accurate_parallel_geq", "all"])
    args = setup(ap.parse_args())
    main(args)
