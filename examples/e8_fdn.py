"""FDN matched to a room impulse response (reference examples/e8_fdn.py).

Four scenarios, mirroring the reference tour:

* ``fdn`` — reference ``example_fdn`` (e8_fdn.py:32-184): N=6 FDN with the
  delays in the feedforward path and mixing-matrix + sigmoid-mapped GEQ in
  the feedback path; trains against a target RIR with multi-scale spectral
  + sparsity losses; writes ``ir_init.wav`` / ``ir_optim.wav``.
* ``accurate_geq`` — reference ``example_fdn_accurate_geq`` (:186-332):
  non-trainable accurate-RT GEQ assigned a target reverberation-time
  profile; analyzes the attenuation filter response, plots simulated RT
  vs. the target (``filter_response.png``) and prints the MSE at the
  band centers.
* ``direct`` — reference ``example_fdn_direct`` (:334-507): same FDN in a
  ``Parallel`` with a clip-mapped direct-path gain branch.
* ``delay_scaled`` — this framework's extra: delay-length-scaled FDN
  attenuation (``parallelFDNGEQ``/PEQ/shelving families, selected with
  ``--attenuation``) with the fused-epoch TPU scan path (``--scan``).

The reference fits a measured Arni RIR; measured data is not shipped here,
so by default a synthetic exponentially-decaying noise RIR (WGN reverb) is
the target — pass ``--rir path.wav`` to fit a measured one.
"""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import argparse
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from _common import example_parser, plot_magnitude, setup


def _target_rir(args, nfft):
    """Target RIR: measured WAV if given, else synthetic WGN reverb."""
    from flamo_tpu.functional import WGN_reverb, find_onset

    if args.rir:
        from flamo_tpu.utils import load_audio

        rir, fs = load_audio(args.rir)
        rir = jnp.asarray(rir[:, :1])
        rir = rir / jnp.max(jnp.abs(rir))
        onset = int(find_onset(rir[:, 0]))
        rir = rir[onset:onset + nfft]
        rir = jnp.pad(rir, ((0, max(0, nfft - rir.shape[0])), (0, 0)))
    else:
        rir = WGN_reverb((1,), t60=0.25, samplerate=args.samplerate)[:nfft]
        rir = jnp.pad(rir, ((0, max(0, nfft - rir.shape[0])), (0, 0)))
    return rir[None, :, :]  # (1, nfft, 1)


def _save_ir(model, path, fs):
    """Render the model IR and write it as a normalized WAV (the reference's
    ir_init/ir_optim artifacts).  Rendered under jit so a tunneled
    accelerator pays one compile instead of per-op round-trips — and so
    Pallas-backed models Mosaic-compile instead of hitting the CPU
    interpreter (get_time_response is functional, CLAUDE.md)."""
    from flamo_tpu.utils import save_audio

    ir = np.asarray(jax.jit(
        lambda m: m.get_time_response(identity=False, fs=fs))(model)
    ).squeeze()
    save_audio(path, ir / np.max(np.abs(ir)), fs=fs)
    return ir


def _build_reference_fdn(args, N, delay_lengths, alias_db, direct=False,
                         backend="xla"):
    """The reference e8 topology: Recursion(fF=delays, fB=mixing·GEQ).

    ``backend='pallas'`` routes the two hot per-bin chains through the
    fused Mosaic kernels — the GEQ SOS cascade (cascade_backend) and the
    closed-loop solve (solve_method) — with identical loss semantics
    (the attenuated bench workload measured 1219 -> 2504 steps/s from
    exactly this swap, BENCH.md)."""
    from flamo_tpu.processor import dsp, system

    nfft = args.nfft
    ig = dsp.Gain(size=(N, 1), nfft=nfft, requires_grad=True,
                  alias_decay_db=alias_db)
    og = dsp.Gain(size=(1, N), nfft=nfft, requires_grad=True,
                  alias_decay_db=alias_db)
    dl = dsp.parallelDelay(size=(N,), max_len=int(max(delay_lengths)),
                           nfft=nfft, isint=True, alias_decay_db=alias_db)
    dl = dl.assign_value(dl.sample2s(jnp.asarray(delay_lengths, jnp.float32)))
    mix = dsp.Matrix(size=(N, N), nfft=nfft, matrix_type="orthogonal",
                     requires_grad=True, alias_decay_db=alias_db)
    # reference: attenuation.map = 20*log10(sigmoid(x)) — always-decaying
    atten = dsp.parallelGEQ(
        size=(N,), octave_interval=1, nfft=nfft, fs=args.samplerate,
        map=lambda x: 20 * jnp.log10(jax.nn.sigmoid(x)),
        requires_grad=True, alias_decay_db=alias_db,
        cascade_backend=backend if backend == "pallas" else "xla")
    fb = system.Series(OrderedDict(
        {"mixing_matrix": mix, "attenuation": atten}))
    loop = system.Recursion(fF=dl, fB=fb,
                            solve_method="pallas" if backend == "pallas"
                            else "ge")
    branch_a = system.Series(OrderedDict({
        "input_gain": ig, "feedback_loop": loop, "output_gain": og}))
    if direct:
        dg = dsp.Gain(size=(1, 1), nfft=nfft, requires_grad=True,
                      map=lambda x: jnp.clip(x, -1.0, 1.0),
                      alias_decay_db=alias_db)
        core = system.Parallel(
            branch_a, system.Series(OrderedDict({"direct": dg})))
    else:
        core = branch_a
    return system.Shell(
        core=core, input_layer=dsp.FFT(nfft),
        output_layer=dsp.iFFTAntiAlias(nfft=nfft, alias_decay_db=alias_db))


def _pick_backend(args, build_fn, target):
    """Resolve ``--backend auto`` into a concrete model: 'auto' tries the
    fused Pallas cascade+solve build behind an initial-loss parity gate
    against the XLA build (same pattern as bench.py's attenuated ladder)
    and falls back on mismatch or failure; CPU defaults to XLA (the
    Pallas interpreter is slower there).  The picker re-seeds before
    each build so both backends get bit-identical initial parameters."""
    import flamo_tpu
    from flamo_tpu.functional import signal_gallery
    from flamo_tpu.optimize.loss import mss_loss, sparsity_loss

    from flamo_tpu.utils import host_eager

    choice = args.backend
    if choice == "auto":
        choice = "xla" if jax.default_backend() == "cpu" else "pallas"
    if choice == "xla":
        flamo_tpu.set_seed(args.seed)
        with host_eager():
            return build_fn("xla"), "xla"

    mss = mss_loss(nfft=[256, 512, 1024], sample_rate=args.samplerate)
    sp = sparsity_loss()
    with host_eager():
        x = signal_gallery(1, args.nfft, 1, "impulse")

    def init_loss(m):
        est = m(x)
        return mss(est, target) + sp(est, target, m)

    losses = {}
    models = {}
    for be in ("xla", "pallas"):
        flamo_tpu.set_seed(args.seed)  # identical init for both builds
        with host_eager():  # eager construction on CPU (CLAUDE.md)
            models[be] = build_fn(be)
        try:
            # the gate jit runs on the DEFAULT backend (Mosaic on TPU)
            losses[be] = float(jax.jit(init_loss)(models[be]))
        except Exception as e:
            if args.backend == "pallas":
                raise
            print(f"backend {be} failed ({type(e).__name__}: {e}); "
                  "using xla")
            return models["xla"], "xla"
    rel = (abs(losses["pallas"] - losses["xla"])
           / max(1e-9, abs(losses["xla"])))
    if rel < 5e-3:
        print(f"backend=pallas (fused cascade+solve kernels; init-loss "
              f"parity rel={rel:.1e})")
        return models["pallas"], "pallas"
    if args.backend == "pallas":
        raise RuntimeError(
            f"pallas backend parity gate failed: {losses}, rel={rel:.2e}")
    print(f"pallas parity gate failed (rel={rel:.1e}); using xla")
    return models["xla"], "xla"


def _train_to_rir(args, model, tag, target=None):
    """Shared train-to-target-RIR block of the fdn/direct scenarios.

    On accelerators every epoch trains through the fused ``lax.scan``
    path (Trainer.train(scan=True) — numerically the identical step
    sequence, no per-step host round-trips); CPU keeps the eager loop
    unless ``--scan`` asks otherwise."""
    from flamo_tpu.optimize import Dataset, Trainer, load_dataset
    from flamo_tpu.optimize.loss import mss_loss, sparsity_loss
    from flamo_tpu.functional import signal_gallery

    from flamo_tpu.utils import host_eager

    _save_ir(model, os.path.join(args.train_dir, f"ir_init_{tag}.wav"),
             args.samplerate)
    with host_eager():
        if target is None:
            target = _target_rir(args, args.nfft)
        ds = Dataset(input=signal_gallery(1, args.nfft, 1, "impulse"),
                     target=target, expand=args.num)
    tl, vl = load_dataset(ds, batch_size=args.batch_size, split=args.split)
    trainer = Trainer(model, max_epochs=args.max_epochs, lr=args.lr,
                      train_dir=args.train_dir)
    trainer.register_criterion(
        mss_loss(nfft=[256, 512, 1024], sample_rate=args.samplerate), 1)
    trainer.register_criterion(sparsity_loss(), 1, requires_model=True)
    use_scan = args.scan or jax.default_backend() != "cpu"
    trainer.train(tl, vl, scan=use_scan)
    model = trainer.net
    _save_ir(model, os.path.join(args.train_dir, f"ir_optim_{tag}.wav"),
             args.samplerate)
    print(f"e8_fdn[{tag}] final loss:", trainer.train_loss[-1])
    assert np.isfinite(trainer.train_loss[-1])
    return trainer


def example_fdn(args):
    """Reference example_fdn: train the N=6 FDN to match the target RIR."""
    from flamo_tpu.utils import host_eager

    delay_lengths = (593, 743, 929, 1153, 1399, 1699)
    with host_eager():
        target = _target_rir(args, args.nfft)
    model, _ = _pick_backend(
        args, lambda be: _build_reference_fdn(
            args, N=6, delay_lengths=delay_lengths, alias_db=30,
            backend=be), target)
    _train_to_rir(args, model, tag="fdn", target=target)


def example_fdn_direct(args):
    """Reference example_fdn_direct: FDN ∥ clip-mapped direct-path gain."""
    from flamo_tpu.utils import host_eager

    delay_lengths = (593, 743, 929, 1153, 1399, 1699)
    with host_eager():
        target = _target_rir(args, args.nfft)
    model, _ = _pick_backend(
        args, lambda be: _build_reference_fdn(
            args, N=6, delay_lengths=delay_lengths, alias_db=30,
            direct=True, backend=be), target)
    _train_to_rir(args, model, tag="direct", target=target)


def example_fdn_accurate_geq(args):
    """Reference example_fdn_accurate_geq: accurate-RT GEQ analysis.

    Assigns a target RT profile to the (non-trainable) accurate GEQ,
    renders the FDN IR, then probes the attenuation filter alone and
    compares the RT it realizes (via the per-sample decay of the first
    delay line) against the target profile at the band centers."""
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.auxiliary.reverb import parallelFDNAccurateGEQ

    nfft, fs = args.nfft, args.samplerate
    N = 6
    alias_db = 0
    delay_lengths = (593, 743, 929, 1153, 1399, 1699)

    ig = dsp.Gain(size=(N, 1), nfft=nfft, requires_grad=True)
    og = dsp.Gain(size=(1, N), nfft=nfft, requires_grad=True)
    dl = dsp.parallelDelay(size=(N,), max_len=int(max(delay_lengths)),
                           nfft=nfft, isint=True)
    dl = dl.assign_value(dl.sample2s(jnp.asarray(delay_lengths, jnp.float32)))
    mix = dsp.Matrix(size=(N, N), nfft=nfft, matrix_type="orthogonal",
                     requires_grad=True)
    atten = parallelFDNAccurateGEQ(octave_interval=1, nfft=nfft, fs=fs,
                                   delays=jnp.asarray(delay_lengths))
    target_rt = jnp.asarray(
        [0.25, 0.5, 0.5, 0.65, 0.7, 0.75, 0.8, 0.75, 0.65, 0.5, 0.25])
    atten = atten.assign_value(target_rt)

    fb = system.Series(OrderedDict(
        {"mixing_matrix": mix, "attenuation": atten}))
    loop = system.Recursion(fF=dl, fB=fb)
    core = system.Series(OrderedDict({
        "input_gain": ig, "feedback_loop": loop, "output_gain": og}))
    model = system.Shell(core=core, input_layer=dsp.FFT(nfft),
                         output_layer=dsp.iFFT(nfft))
    _save_ir(model, os.path.join(args.train_dir, "ir_accurate_geq.wav"), fs)

    # Analyze the attenuation filter alone (reference :298-332): its
    # magnitude at each bin determines the per-sample decay of delay line 0,
    # hence the RT the FDN realizes at that frequency.
    center_freqs = ([atten.shelving_crossover[0]]
                    + list(atten.center_freq)
                    + [atten.shelving_crossover[1]])
    atten_model = system.Shell(
        core=atten, input_layer=dsp.FFT(nfft),
        output_layer=dsp.Transform(jnp.abs))
    H = atten_model.get_freq_response()  # (1, M, N)
    mag0 = np.abs(np.asarray(H[0, :, 0]))
    with np.errstate(divide="ignore"):
        simulated_rt = -3 / fs / np.log10(
            np.maximum(mag0, 1e-12) ** (1.0 / delay_lengths[0]))
    freq_axis = np.linspace(0, fs / 2, nfft // 2 + 1)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.plot(freq_axis, simulated_rt, label="Filter response")
    ax.plot(center_freqs, np.asarray(target_rt), "o", label="Target RT")
    ax.set_title("Reverberation Time")
    ax.set_xlabel("Frequency")
    ax.set_ylabel("Time (s)")
    ax.set_xscale("log")
    ax.legend()
    fig.savefig(os.path.join(args.train_dir, "filter_response.png"))
    plt.close(fig)

    idx = [int(np.argmin(np.abs(freq_axis - f))) for f in center_freqs]
    rt_mse = float(np.mean((simulated_rt[idx] - np.asarray(target_rt)) ** 2))
    print("e8_fdn[accurate_geq] RT MSE at band centers:", rt_mse)
    # the accurate design realizes the RT profile to within tens of ms
    assert rt_mse < 0.01, rt_mse


def example_delay_scaled(args):
    """This framework's delay-scaled FDN attenuation families + scan path."""
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.auxiliary.reverb import parallelFDNGEQ
    from flamo_tpu.optimize import Dataset, Trainer, load_dataset
    from flamo_tpu.optimize.loss import mss_loss, sparsity_loss
    from flamo_tpu.functional import signal_gallery

    nfft = args.nfft
    N = 4
    delays = (179, 211, 233, 251)
    alias_db = 30.0

    target = _target_rir(args, nfft)

    ig = dsp.Gain(size=(N, 1), nfft=nfft, requires_grad=True,
                  alias_decay_db=alias_db)
    og = dsp.Gain(size=(1, N), nfft=nfft, requires_grad=True,
                  alias_decay_db=alias_db)
    dl = dsp.parallelDelay(size=(N,), max_len=max(delays), nfft=nfft,
                           isint=True, alias_decay_db=alias_db)
    dl = dl.assign_value(dl.sample2s(jnp.asarray(delays, jnp.float32)))
    if args.attenuation == "geq":
        atten = parallelFDNGEQ(octave_interval=1, nfft=nfft,
                               fs=args.samplerate,
                               delays=jnp.asarray(delays),
                               requires_grad=True,
                               alias_decay_db=alias_db)
    elif args.attenuation == "accurate_geq":
        from flamo_tpu.auxiliary.reverb import parallelFDNAccurateGEQ

        atten = parallelFDNAccurateGEQ(octave_interval=1, nfft=nfft,
                                       fs=args.samplerate,
                                       delays=jnp.asarray(delays),
                                       alias_decay_db=alias_db)
    elif args.attenuation == "peq":
        from flamo_tpu.auxiliary.reverb import parallelFDNPEQ

        atten = parallelFDNPEQ(n_bands=6, delays=jnp.asarray(delays),
                               nfft=nfft, fs=args.samplerate,
                               requires_grad=True,
                               alias_decay_db=alias_db)
    else:  # shelving
        from flamo_tpu.auxiliary.reverb import parallelFirstOrderShelving

        atten = parallelFirstOrderShelving(nfft=nfft, fs=args.samplerate,
                                           delays=jnp.asarray(delays),
                                           requires_grad=True,
                                           alias_decay_db=alias_db)
    fb = dsp.Matrix(size=(N, N), nfft=nfft, matrix_type="orthogonal",
                    requires_grad=True, alias_decay_db=alias_db)
    loop = system.Recursion(
        fF=system.Series(OrderedDict({"delays": dl, "attenuation": atten})),
        fB=fb)
    core = system.Series(OrderedDict({
        "input_gain": ig, "feedback_loop": loop, "output_gain": og}))
    model = system.Shell(core=core, input_layer=dsp.FFT(nfft),
                         output_layer=dsp.iFFTAntiAlias(
                             nfft=nfft, alias_decay_db=alias_db))

    ds = Dataset(input=signal_gallery(1, nfft, 1, "impulse"), target=target,
                 expand=args.num)
    tl, vl = load_dataset(ds, batch_size=args.batch_size, split=args.split)
    trainer = Trainer(model, max_epochs=args.max_epochs, lr=args.lr,
                      train_dir=args.train_dir)
    trainer.register_criterion(
        mss_loss(nfft=[256, 512, 1024], sample_rate=args.samplerate), 1)
    trainer.register_criterion(sparsity_loss(), 0.2, requires_model=True)
    if args.scan:
        # TPU fast path: fuse the whole epoch (all batches) into one
        # dispatched lax.scan program — numerically lockstep with train()
        from flamo_tpu.optimize import stack_loader

        bx, bt = stack_loader(tl)
        history = trainer.fit_scan_epochs(bx, bt, n_epochs=args.max_epochs)
        trainer.train_loss = [float(history[0]), float(history[-1])]
        print(f"fit_scan_epochs: loss {history[0]:.4f} -> "
              f"{history[-1]:.4f} over {len(history)} steps")
    else:
        trainer.train(tl, vl)

    # magnitude response before/after on top of the target (reference's
    # response-analysis artifact)
    target_H = np.fft.rfft(np.asarray(target[0, :, 0]))
    opt_H = np.asarray(trainer.net.get_freq_response()[0, :, 0])
    plot_magnitude({"target": target_H, "optimized": opt_H},
                   os.path.join(args.train_dir, "fdn_magnitude.png"),
                   fs=args.samplerate, nfft=nfft,
                   title="FDN magnitude vs target")
    print("e8_fdn[delay_scaled] final loss:", trainer.train_loss[-1])
    assert np.isfinite(trainer.train_loss[-1])


def main(args):
    scenarios = {
        "fdn": example_fdn,
        "accurate_geq": example_fdn_accurate_geq,
        "direct": example_fdn_direct,
        "delay_scaled": example_delay_scaled,
    }
    names = (list(scenarios) if args.scenario == "all"
             else [args.scenario])
    for name in names:
        print(f"--- e8_fdn scenario: {name} ---")
        scenarios[name](args)


if __name__ == "__main__":
    ap = example_parser(nfft=8192, max_epochs=3, num=16, batch_size=2,
                        lr=1e-3)
    ap.add_argument("--rir", type=str, default=None,
                    help="path to a measured RIR wav (optional)")
    ap.add_argument("--scenario", type=str, default="all",
                    choices=["fdn", "accurate_geq", "direct",
                             "delay_scaled", "all"])
    ap.add_argument("--attenuation", type=str, default="geq",
                    choices=["geq", "accurate_geq", "peq", "shelving"])
    ap.add_argument("--scan", action="store_true",
                    help="fused whole-epoch scan training (always on for "
                         "accelerator backends; this forces it on CPU too)")
    ap.add_argument("--backend", type=str, default="auto",
                    choices=["auto", "pallas", "xla"],
                    help="per-bin kernel backend for the fdn/direct "
                         "scenarios: 'auto' uses the fused Pallas "
                         "cascade+solve kernels on accelerators behind an "
                         "init-loss parity gate (bench.py's pattern) and "
                         "XLA on CPU")
    args = setup(ap.parse_args())
    main(args)
