"""Shared CLI plumbing for the examples (mirrors the reference's common
argparse vocabulary, e.g. examples/e0_siso.py:254-318)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def example_parser(**overrides):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nfft", type=int, default=overrides.get("nfft", 96000))
    ap.add_argument("--samplerate", type=int,
                    default=overrides.get("samplerate", 48000))
    ap.add_argument("--device", type=str, default=None,
                    help="'cpu' forces the CPU backend; default lets JAX "
                         "pick.  On tunneled/remote accelerators prefer "
                         "'cpu': examples construct models and render "
                         "responses eagerly, which pays a compile+transfer "
                         "round-trip per op there (the jitted production "
                         "path is the models/Trainer API, see "
                         "docs/performance.md)")
    ap.add_argument("--batch_size", type=int,
                    default=overrides.get("batch_size", 1))
    ap.add_argument("--num", type=int, default=overrides.get("num", 64),
                    help="dataset expansion length")
    ap.add_argument("--split", type=float, default=0.8)
    ap.add_argument("--max_epochs", type=int,
                    default=overrides.get("max_epochs", 3))
    ap.add_argument("--lr", type=float, default=overrides.get("lr", 1e-3))
    ap.add_argument("--train_dir", type=str, default=None)
    ap.add_argument("--patience_delta", type=float, default=1e-5)
    ap.add_argument("--seed", type=int, default=overrides.get("seed", 130709))
    ap.add_argument("--dtype", type=str, default="float32",
                    choices=["float32", "float64"],
                    help="float64 enables x64 mode (reference examples "
                         "default to float64 on CPU; TPU is float32-native)")
    return ap


def plot_signal(y, path, title="Output signal", xlim=None, labels=None):
    """Time-domain plot (one subplot per channel), saved as PNG — the
    reference examples' plt.plot/plt.show pattern, headless."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    y = np.asarray(y)
    if y.ndim == 3:
        y = y[0]
    if y.ndim == 1:
        y = y[:, None]
    n_ch = y.shape[-1]
    fig, axes = plt.subplots(n_ch, 1, figsize=(7, 2.2 * n_ch), sharex=True,
                             squeeze=False)
    for i in range(n_ch):
        ax = axes[i, 0]
        ax.plot(y[:, i])
        ax.grid(True)
        ax.set_ylabel("Amplitude")
        if xlim:
            ax.set_xlim(*xlim)
        ax.set_title(labels[i] if labels else f"{title} — channel {i + 1}")
    axes[-1, 0].set_xlabel("Samples")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


def plot_magnitude(curves, path, fs, nfft, title="Magnitude response",
                   db=True):
    """Overlaid magnitude-response plot.  curves: {label: (M,) complex or
    magnitude array}."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    fig, ax = plt.subplots(figsize=(7, 4))
    f = np.linspace(0, fs / 2, nfft // 2 + 1)
    for label, H in curves.items():
        mag = np.abs(np.asarray(H)).squeeze()
        if db:
            mag = 20 * np.log10(np.maximum(mag, 1e-12))
        ax.plot(f[:len(mag)], mag, label=label)
    ax.set_xscale("log")
    ax.set_xlim(20, fs / 2)
    ax.set_xlabel("Frequency (Hz)")
    ax.set_ylabel("Magnitude (dB)" if db else "Magnitude")
    ax.set_title(title)
    ax.grid(True, which="both", alpha=0.4)
    ax.legend()
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


def plot_losses(loss_lists, path, title="Training loss"):
    """Per-epoch loss curves.  loss_lists: {label: [values]}."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 3.5))
    for label, values in loss_lists.items():
        ax.plot(values, marker="o", label=label)
    ax.set_xlabel("Epoch")
    ax.set_ylabel("Loss")
    ax.set_title(title)
    ax.grid(True, alpha=0.4)
    ax.legend()
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


class PlainMSE:
    """Elementwise MSE — the reference examples' nn.MSELoss()."""

    name = "MSE"

    def __call__(self, y_pred, y_true):
        import jax.numpy as jnp

        return jnp.mean((y_pred - y_true) ** 2)


def plot_two_channel(curves_per_ch, path, title="Magnitude Response"):
    """The reference filter examples' per-channel magnitude subplot grid.
    curves_per_ch: list (one per channel) of {label: (array, linestyle)}."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    fig, axes = plt.subplots(len(curves_per_ch), 1, figsize=(8, 6),
                             squeeze=False)
    for ch, curves in enumerate(curves_per_ch):
        ax = axes[ch, 0]
        for label, (y, style) in curves.items():
            ax.plot(np.abs(np.asarray(y)), style, label=label)
        ax.set_title(title)
        ax.set_xlabel("Frequency")
        ax.set_ylabel("Magnitude")
        ax.legend()
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


def train_filter_to_target(args, filt, target_mag, in_ch, tag,
                           assert_improves=True):
    """Shared body of the e7 filter-matching examples (reference
    e7_{biquad,svf,geq,peq}.py): wrap the module in a Shell with an
    |.|-transform output, train elementwise MSE against the target
    magnitude, and write the reference's magnitude_response artifact.
    Returns the Trainer."""
    import numpy as np
    import jax.numpy as jnp

    from flamo_tpu.processor import dsp, system
    from flamo_tpu.optimize import Dataset, Trainer, load_dataset
    from flamo_tpu.functional import signal_gallery

    model = system.Shell(core=filt, input_layer=dsp.FFT(args.nfft),
                         output_layer=dsp.Transform(jnp.abs))
    estimation_init = model.get_freq_response()

    x = signal_gallery(1, n_samples=args.nfft, n=in_ch,
                       signal_type="impulse", fs=args.samplerate)
    ds = Dataset(input=x, target=target_mag, expand=args.num)
    tl, vl = load_dataset(ds, batch_size=args.batch_size, split=args.split)
    trainer = Trainer(model, max_epochs=args.max_epochs, lr=args.lr,
                      step_size=25, patience_delta=1e-5,
                      train_dir=args.train_dir)
    trainer.register_criterion(PlainMSE(), 1)
    trainer.train(tl, vl)
    estimation = trainer.net.get_freq_response()

    plot_two_channel(
        [{"Target": (target_mag[0, :, c], "-"),
          "Estimation Init": (estimation_init[0, :, c], "-"),
          "Estimation": (estimation[0, :, c], "--")}
         for c in range(target_mag.shape[-1])],
        os.path.join(args.train_dir, f"magnitude_response_{tag}.png"))
    print(f"[{tag}] final loss:", trainer.train_loss[-1])
    assert np.isfinite(trainer.train_loss[-1])
    if assert_improves:
        assert trainer.train_loss[-1] <= trainer.train_loss[0], (
            f"{tag}: training did not reduce the loss")
    return trainer


def setup(args):
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.dtype == "float64":
        from flamo_tpu.utils import enable_x64

        enable_x64()
    import flamo_tpu

    flamo_tpu.set_seed(args.seed)
    if args.train_dir is None:
        args.train_dir = os.path.join(
            "output", time.strftime("%Y%m%d-%H%M%S"))
    os.makedirs(args.train_dir, exist_ok=True)
    with open(os.path.join(args.train_dir, "args.txt"), "w") as f:
        f.write("\n".join(f"{k}: {v}" for k, v in vars(args).items()))
    return args
