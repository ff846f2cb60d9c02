"""Manual module chaining (reference examples/e2_chaining_filters.py):
cascading modules by hand, SISO -> MIMO, assign_value, requires_grad.

Mirrors the reference's three scenarios (example_mimo / example_siso /
example_assign_new_values, reference :18-200) with the IRs plotted to
PNGs in train_dir, plus the functional requires_grad walk-through."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from _common import example_parser, plot_signal, setup


def scenario_siso(args, dsp, signal_gallery):
    """parallelGain -> Delay chain on a unit impulse: the IR is one scaled,
    delayed impulse (reference example_mimo, :18-70)."""
    g = dsp.parallelGain(size=(1,), nfft=args.nfft)
    d = dsp.Delay(size=(1, 1), max_len=700, isint=True, nfft=args.nfft,
                  fs=args.samplerate)
    x = signal_gallery(1, args.nfft, 1, "impulse", fs=args.samplerate)
    y = dsp.iFFT(args.nfft)(d(g(dsp.FFT(args.nfft)(x))))
    delay_samples = float(d.s2sample(d.param[0, 0]))
    path = plot_signal(
        y, os.path.join(args.train_dir, "e2_siso_ir.png"), xlim=(0, 1200),
        labels=[f"gain={float(g.param[0]):.2f}, "
                f"delay={delay_samples:.0f} samples"])
    peak = int(np.argmax(np.abs(np.asarray(y)[0, :, 0])))
    print(f"siso chain: delay {delay_samples:.0f} samples, IR peak at "
          f"{peak} -> {path}")
    assert abs(peak - round(delay_samples)) <= 1


def scenario_mimo(args, dsp, signal_gallery):
    """2-in 3-out version: parallelGain acts channel-wise, the Delay matrix
    mixes channels — each output shows two delayed impulses, one per input
    (reference example_siso, :73-128)."""
    in_ch, out_ch = 2, 3
    g = dsp.parallelGain(size=(in_ch,), nfft=args.nfft)
    d = dsp.Delay(size=(out_ch, in_ch), max_len=1000, isint=True,
                  nfft=args.nfft, fs=args.samplerate)
    x = signal_gallery(1, args.nfft, in_ch, "impulse", fs=args.samplerate)
    y = dsp.iFFT(args.nfft)(d(g(dsp.FFT(args.nfft)(x))))
    path = plot_signal(y, os.path.join(args.train_dir, "e2_mimo_ir.png"),
                       title="MIMO chain IR", xlim=(0, 1200))
    print(f"mimo chain: output {y.shape} (two impulses per channel) "
          f"-> {path}")
    assert y.shape == (1, args.nfft, out_ch)


def scenario_assign_values(args, dsp, signal_gallery):
    """assign_value is functional: it returns a NEW module; the original is
    untouched (reference example_assign_new_values, :130-200, where the
    torch version mutates in place)."""
    in_ch, out_ch = 2, 3
    g = dsp.parallelGain(size=(in_ch,), nfft=args.nfft)
    d = dsp.Delay(size=(out_ch, in_ch), max_len=1000, isint=True,
                  nfft=args.nfft, fs=args.samplerate)
    g2 = g.assign_value(jnp.asarray([0.5, -1.0]))
    d2 = d.assign_value(d.sample2s(jnp.asarray(
        [[100.0, 400.0], [200.0, 500.0], [300.0, 600.0]])))
    assert float(jnp.abs(g.param - g2.param).max()) > 0
    x = signal_gallery(1, args.nfft, in_ch, "impulse", fs=args.samplerate)
    y = dsp.iFFT(args.nfft)(d2(g2(dsp.FFT(args.nfft)(x))))
    path = plot_signal(
        y, os.path.join(args.train_dir, "e2_assigned_ir.png"),
        title="After assign_value", xlim=(0, 700))
    y0 = np.asarray(y)[0, :, 0]
    print(f"assigned delays: peaks at {np.argsort(np.abs(y0))[-2:]} "
          f"-> {path}")
    # output ch 0 = 0.5 * delta(n-100) - 1.0 * delta(n-400)
    assert abs(y0[100] - 0.5) < 1e-4 and abs(y0[400] + 1.0) < 1e-4
    print("assign_value returns a new module; original untouched")


def scenario_requires_grad(args, dsp):
    """requires_grad governs the trainable mask (the functional counterpart
    of the reference's parameter freezing)."""
    from flamo_tpu.core import trainable_mask

    g = dsp.Gain(size=(2, 1), nfft=args.nfft, requires_grad=True)
    bq = dsp.parallelBiquad(size=(2,), n_sections=1, filter_type="highpass",
                            nfft=args.nfft, fs=args.samplerate)
    assert jax.tree_util.tree_leaves(trainable_mask(g))[0] is True
    assert jax.tree_util.tree_leaves(trainable_mask(bq))[0] is False
    print("requires_grad -> trainable mask: gain True, frozen biquad False")


def main(args):
    from flamo_tpu.functional import signal_gallery
    from flamo_tpu.processor import dsp

    scenario_siso(args, dsp, signal_gallery)
    scenario_mimo(args, dsp, signal_gallery)
    scenario_assign_values(args, dsp, signal_gallery)
    scenario_requires_grad(args, dsp)


if __name__ == "__main__":
    args = setup(example_parser(nfft=4096).parse_args())
    main(args)
