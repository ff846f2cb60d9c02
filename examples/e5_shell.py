"""Shell container (reference examples/e5_shell.py): construction, layer
get/set, the error tour, get_time_response / get_freq_response (incl.
identity=True input-free responses), and training inside a Shell.

Mirrors the reference's five scenarios (example_shell / _error / _gets /
_gets_2 / _training, reference :16-569) with response plots to PNG."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from collections import OrderedDict

import jax.numpy as jnp
import numpy as np

from _common import (example_parser, plot_losses, plot_magnitude,
                     plot_signal, setup)


def build_core(args, dsp, system, N=3):
    return system.Series(OrderedDict({
        "in": dsp.Gain(size=(N, 1), nfft=args.nfft),
        "filt": dsp.parallelFilter(size=(16, N), nfft=args.nfft),
        "out": dsp.Gain(size=(1, N), nfft=args.nfft),
    }))


def scenario_shell(args, dsp, system):
    """Construction + functional core/layer get/set
    (reference example_shell, :16-108)."""
    core = build_core(args, dsp, system)
    model = system.Shell(core=core, input_layer=dsp.FFT(args.nfft),
                         output_layer=dsp.iFFT(args.nfft))
    assert isinstance(model.get_inputLayer(), dsp.FFT)
    assert model.get_core() is core

    # setters are functional: a NEW Shell is returned, the old unchanged
    m2 = model.set_outputLayer(dsp.Transform(lambda z: jnp.abs(z)))
    assert isinstance(model.get_outputLayer(), dsp.iFFT)
    assert isinstance(m2.get_outputLayer(), dsp.Transform)
    m3 = model.set_core(build_core(args, dsp, system, N=4))
    assert m3.get_core() is not core
    print("shell get/set: functional layer and core swaps verified")


def scenario_errors(args, dsp, system):
    """Every IO/attribute incoherence raises at construction
    (reference example_shell_error, :111-167)."""
    core = build_core(args, dsp, system)
    cases = [
        ("input layer IO",
         lambda: system.Shell(core=core,
                              input_layer=dsp.Gain(size=(2, 2),
                                                   nfft=args.nfft))),
        ("output layer IO",
         lambda: system.Shell(core=core,
                              output_layer=dsp.Gain(size=(4, 4),
                                                    nfft=args.nfft))),
        ("nfft mismatch",
         lambda: system.Shell(core=core,
                              input_layer=dsp.FFT(args.nfft * 2))),
    ]
    for name, fn in cases:
        try:
            fn()
            raise RuntimeError("should have raised")
        except (AssertionError, ValueError) as e:
            print(f"shell {name} caught:", str(e)[:64], "...")


def scenario_responses(args, dsp, system):
    """get_time_response / get_freq_response swap the io layers
    temporarily and undo the alias envelope
    (reference example_shell_gets, :169-238)."""
    core = build_core(args, dsp, system)
    model = system.Shell(core=core, input_layer=dsp.FFT(args.nfft),
                         output_layer=dsp.iFFT(args.nfft))
    ir = model.get_time_response(fs=args.samplerate)
    H = model.get_freq_response(fs=args.samplerate)
    assert ir.shape == (1, args.nfft, 1)
    assert H.shape == (1, args.nfft // 2 + 1, 1)
    # consistency: rfft of the IR == the frequency response
    np.testing.assert_allclose(
        np.asarray(jnp.fft.rfft(ir, n=args.nfft, axis=1)), np.asarray(H),
        atol=1e-4)
    p1 = plot_signal(ir, os.path.join(args.train_dir, "e5_ir.png"),
                     title="Shell impulse response", xlim=(0, 200))
    p2 = plot_magnitude({"shell": np.asarray(H)[0, :, 0]},
                        os.path.join(args.train_dir, "e5_freq.png"),
                        args.samplerate, args.nfft)
    print(f"responses: IR {ir.shape}, H {H.shape} -> {p1}, {p2}")
    # the original layers are untouched afterwards
    assert isinstance(model.get_inputLayer(), dsp.FFT)


def scenario_identity(args, dsp, system):
    """identity=True diag-embeds the impulse: per-channel input-free IRs
    of a MIMO core (reference example_shell_gets_2, :240-315)."""
    mimo = system.Shell(core=dsp.Matrix(size=(3, 3), nfft=args.nfft,
                                        matrix_type="orthogonal"),
                        input_layer=dsp.FFT(args.nfft),
                        output_layer=dsp.iFFT(args.nfft))
    ir_id = mimo.get_time_response(fs=args.samplerate, identity=True)
    assert ir_id.shape == (1, args.nfft, 3, 3)
    # a frequency-flat orthogonal matrix: IR condensed at n=0, and the
    # 3x3 slice there is the orthogonal matrix itself
    U = np.asarray(ir_id)[0, 0]
    np.testing.assert_allclose(U @ U.T, np.eye(3), atol=1e-4)
    print("identity=True input-free IRs:", ir_id.shape,
          "(n=0 slice is the orthogonal mixing matrix)")


def scenario_training(args, dsp, system):
    """Train the Shell's core FIR to match a delayed-decay target IR
    (reference example_shell_training, :317-569)."""
    from flamo_tpu.functional import signal_gallery
    from flamo_tpu.optimize import Dataset, Trainer, load_dataset
    from flamo_tpu.optimize.loss import mse_loss

    taps = 64
    fir = dsp.Filter(size=(taps, 1, 1), nfft=args.nfft, requires_grad=True)
    model = system.Shell(core=fir, input_layer=dsp.FFT(args.nfft),
                         output_layer=dsp.Transform(lambda z: jnp.abs(z)))

    n = np.arange(taps)
    target_ir = (0.9 ** n * np.cos(0.3 * n)).astype(np.float32)
    target_H = np.abs(np.fft.rfft(target_ir, args.nfft))[:, None]

    x = signal_gallery(1, args.nfft, 1, "impulse", fs=args.samplerate)
    ds = Dataset(input=x, target=jnp.asarray(target_H)[None],
                 expand=args.num)
    tl, vl = load_dataset(ds, batch_size=args.batch_size, split=args.split)
    trainer = Trainer(model, max_epochs=args.max_epochs, lr=args.lr,
                      train_dir=args.train_dir)
    trainer.register_criterion(mse_loss(), 1)
    H_init = trainer.net.get_freq_response(fs=args.samplerate)
    trainer.train(tl, vl)
    H_opt = trainer.net.get_freq_response(fs=args.samplerate)
    path = plot_magnitude(
        {"target": target_H[:, 0], "init": np.asarray(H_init)[0, :, 0],
         "optimized": np.asarray(H_opt)[0, :, 0]},
        os.path.join(args.train_dir, "e5_training_mag.png"),
        args.samplerate, args.nfft, title="Shell-trained FIR")
    plot_losses({"train": trainer.train_loss, "valid": trainer.valid_loss},
                os.path.join(args.train_dir, "e5_losses.png"))
    print(f"shell training: loss {trainer.train_loss[0]:.4f} -> "
          f"{trainer.train_loss[-1]:.4f} ({path})")
    assert trainer.train_loss[-1] < trainer.train_loss[0]


def main(args):
    from flamo_tpu.processor import dsp, system

    scenario_shell(args, dsp, system)
    scenario_errors(args, dsp, system)
    scenario_responses(args, dsp, system)
    scenario_identity(args, dsp, system)
    scenario_training(args, dsp, system)


if __name__ == "__main__":
    args = setup(example_parser(nfft=4096, max_epochs=10, num=16,
                                lr=1e-2).parse_args())
    main(args)
