"""Series semantics (reference examples/e3_series_class.py): construction,
error tours, OrderedDict keys, nesting flattening, training a member
module, and the structural edit utilities.

Mirrors the reference's six scenarios (example_series / _with_error /
_OrderedDict / _nesting / _training / _utils, reference :19-512) with the
trained-IR comparison plotted to PNG in train_dir."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from _common import example_parser, plot_losses, plot_signal, setup


def scenario_basic(args, dsp, system, signal_gallery):
    """A Series behaves as the composition of its members
    (reference example_series, :19-57)."""
    g = dsp.parallelGain(size=(2,), nfft=args.nfft)
    d = dsp.Delay(size=(3, 2), max_len=1000, isint=True, nfft=args.nfft,
                  fs=args.samplerate)
    chain = system.Series(OrderedDict({
        "input": dsp.FFT(args.nfft), "gain": g, "delay": d,
        "output": dsp.iFFT(args.nfft)}))
    x = signal_gallery(1, args.nfft, 2, "impulse", fs=args.samplerate)
    y_series = chain(x)
    y_manual = dsp.iFFT(args.nfft)(d(g(dsp.FFT(args.nfft)(x))))
    assert float(jnp.abs(y_series - y_manual).max()) < 1e-6
    print("Series(FFT, gain, delay, iFFT) == manual composition")


def scenario_errors(args, dsp, system):
    """All shape/attribute incoherences surface at CONSTRUCTION with the
    reference's messages (reference example_series_with_error, :60-104)."""
    try:
        system.Series(dsp.Gain(size=(3, 1), nfft=args.nfft),
                      dsp.Gain(size=(2, 4), nfft=args.nfft))
        raise RuntimeError("should have raised")
    except AssertionError as e:
        print("IO mismatch caught:", str(e)[:72], "...")

    try:
        system.Series(dsp.Gain(size=(2, 1), nfft=args.nfft),
                      dsp.Gain(size=(2, 2), nfft=args.nfft * 2))
        raise RuntimeError("should have raised")
    except ValueError as e:
        print("nfft mismatch caught:", str(e)[:72], "...")

    try:
        system.Series(
            dsp.Gain(size=(2, 1), nfft=args.nfft, alias_decay_db=0.0),
            dsp.Gain(size=(2, 2), nfft=args.nfft, alias_decay_db=30.0))
        raise RuntimeError("should have raised")
    except ValueError as e:
        print("alias_decay_db mismatch caught:", str(e)[:60], "...")


def scenario_keys_and_nesting(args, dsp, system):
    """OrderedDict keys survive flattening; nested Series/dicts are
    unpacked with unique-key bookkeeping; members are addressable by name
    (reference example_series_OrderedDict + _nesting, :105-204)."""
    inner = system.Series(OrderedDict({
        "a": dsp.Gain(size=(2, 1), nfft=args.nfft),
        "b": dsp.Gain(size=(2, 2), nfft=args.nfft)}))
    outer = system.Series(inner, OrderedDict({
        "c": dsp.Gain(size=(1, 2), nfft=args.nfft)}))
    print("flattened keys:", outer.keys)
    assert outer.keys == ("a", "b", "c")
    assert outer["b"] is outer.b  # key and attribute access
    assert outer.input_channels == 1 and outer.output_channels == 1

    try:
        system.Series(OrderedDict({"a": dsp.Gain(size=(2, 2),
                                                 nfft=args.nfft)}),
                      OrderedDict({"a": dsp.Gain(size=(2, 2),
                                                 nfft=args.nfft)}))
        raise RuntimeError("should have raised")
    except ValueError as e:
        print("duplicate key caught:", e)


def scenario_training(args, dsp, system, signal_gallery):
    """Train ONE member (the parallelGain) of a Series to match a target
    IR through frozen delays (reference example_series_training,
    :205-320); plots initial vs optimized vs target IRs."""
    from flamo_tpu.optimize import Dataset, Trainer, load_dataset

    in_ch, out_ch = 2, 3
    g = dsp.parallelGain(size=(in_ch,), nfft=args.nfft, requires_grad=True)
    d = dsp.Delay(size=(out_ch, in_ch), max_len=1000, isint=True,
                  nfft=args.nfft, fs=args.samplerate)
    model = system.Series(OrderedDict({
        "input_layer": dsp.FFT(args.nfft),
        "Gains": g, "Delays": d,
        "output_layer": dsp.iFFT(args.nfft)}))

    x = signal_gallery(1, args.nfft, in_ch, "impulse",
                       fs=args.samplerate)
    target_gains = [0.5, -1.0]
    delays = np.round(np.asarray(d.s2sample(d.param))).astype(int)
    target = np.zeros((args.nfft, out_ch), dtype=np.float32)
    for i in range(out_ch):
        for j in range(in_ch):
            target[delays[i, j], i] += target_gains[j]

    class L1Loss:
        name = "L1"

        def __call__(self, y_pred, y_true):
            return jnp.mean(jnp.abs(y_pred - y_true))

    ds = Dataset(input=x, target=jnp.asarray(target)[None], expand=args.num)
    tl, vl = load_dataset(ds, batch_size=args.batch_size, split=args.split)
    trainer = Trainer(model, max_epochs=args.max_epochs, lr=args.lr,
                      patience_delta=0, train_dir=args.train_dir)
    trainer.register_criterion(L1Loss(), 1)

    ir_init = model(x)
    trainer.train(tl, vl)
    trained = trainer.net
    ir_optim = trained(x)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(out_ch, 1, figsize=(7, 7), sharex=True)
    for i in range(out_ch):
        axes[i].plot(np.asarray(ir_init)[0, :, i], label="Initial")
        axes[i].plot(np.asarray(ir_optim)[0, :, i], label="Optimized")
        axes[i].plot(target[:, i], "--", label="Target")
        axes[i].set_xlim(0, 1200)
        axes[i].grid(True)
        axes[i].set_title(f"Output channel {i + 1}")
    axes[0].legend()
    axes[-1].set_xlabel("Samples")
    fig.tight_layout()
    path = os.path.join(args.train_dir, "e3_series_training.png")
    fig.savefig(path)
    plt.close(fig)

    gains = np.asarray(trained["Gains"].param)
    print(f"trained gains {gains.round(3)} -> target {target_gains} "
          f"({path})")
    plot_losses({"train": trainer.train_loss, "valid": trainer.valid_loss},
                os.path.join(args.train_dir, "e3_losses.png"))
    assert trainer.train_loss[-1] < trainer.train_loss[0]
    if args.max_epochs >= 5:  # smoke runs (run_all) use 2 epochs
        assert np.allclose(gains, target_gains, atol=0.2)


def scenario_utils(args, dsp, system):
    """Functional structural edits: append / prepend / insert return new
    Series (reference example_series_utils, :320-420)."""
    s = system.Series(dsp.Gain(size=(2, 2), nfft=args.nfft))
    s2 = s.append(dsp.Gain(size=(3, 2), nfft=args.nfft)).prepend(
        dsp.Gain(size=(2, 1), nfft=args.nfft))
    s3 = s2.insert(1, dsp.Gain(size=(2, 2), nfft=args.nfft))
    print(f"edits: {len(s)} -> {len(s2)} -> {len(s3)} modules; "
          f"{s3.input_channels} -> {s3.output_channels} channels")
    assert len(s) == 1 and len(s2) == 3 and len(s3) == 4
    # the original is untouched (functional edits)
    assert len(s.modules) == 1


def main(args):
    from flamo_tpu.functional import signal_gallery
    from flamo_tpu.processor import dsp, system

    scenario_basic(args, dsp, system, signal_gallery)
    scenario_errors(args, dsp, system)
    scenario_keys_and_nesting(args, dsp, system)
    scenario_training(args, dsp, system, signal_gallery)
    scenario_utils(args, dsp, system)


if __name__ == "__main__":
    args = setup(example_parser(nfft=4096, max_epochs=10, num=16,
                                lr=5e-2).parse_args())
    main(args)
