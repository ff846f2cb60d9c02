"""Hyper-conditioned recursion (reference examples/e4_recursion_nn.py).

Two scenarios:

* ``comb_nn`` — the reference's full demo (:14-345): a multichannel comb
  (delay lines in the feedforward path, biquad filters in the feedback
  path) whose biquad parameters are predicted by an MLP stack conditioned
  on a target magnitude response (system identification).  Stability is
  enforced by subclassing ``Biquad`` with a custom constrained map
  (``LossyBiquad`` — gains forced below 0 dB), demonstrating how the DSP
  modules are customized.  Where the reference loops over the batch in
  Python ("the only way to process batches larger than 1",
  e4_recursion_nn.py:240-247), here the whole shell is ``jax.vmap``-ed
  over the batch inside one jitted train step.
* ``gains_nn`` — the original small demo: an MLP predicts stable loop
  gains injected through ``ext_param``.
"""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from _common import example_parser, setup

# flamo_tpu imported lazily (after setup() picks the backend) — the
# LossyBiquad class is defined inside build_comb for the same reason.


def make_lossy_biquad_class(dsp):
    """Subclass Biquad with a forced-lossy map (reference LossyBiquad,
    e4_recursion_nn.py:71-152): cutoff sigmoid-squashed to (0, 1), gain
    sigmoid-squashed and clamped to [-60, -0.1] dB so the feedback path
    always attenuates."""

    class LossyBiquad(dsp.Biquad):
        def _map_clamp(self, x):
            if self.filter_type in ("lowpass", "highpass"):
                fc = jnp.clip(jax.nn.sigmoid(x[:, 0] * 0.25), 0.0, 1.0)
                g = jnp.clip(
                    20 * jnp.log10(jax.nn.sigmoid(x[:, 1] * 0.25)),
                    -60.0, -0.1)
                return jnp.stack([fc, g], axis=1)
            eps = jnp.finfo(self.dtype).eps
            fc1 = jnp.clip(x[:, 0], eps, 1 - eps)
            fc2 = jnp.clip(x[:, 1], eps, 1 - eps)
            g = jnp.clip(
                20 * jnp.log10(jax.nn.sigmoid(jnp.abs(x[:, -1]))),
                -60.0, 0.0)
            return jnp.stack([fc1, fc2, g], axis=1)

    return LossyBiquad


def init_mlp_stack(key, in_dim, out_dim, hidden=(128, 64)):
    """The reference's MLP stack (Linear+LayerNorm+ReLU)*, final dense."""
    sizes = (in_dim, *hidden, out_dim)
    params = []
    for i in range(len(sizes) - 1):
        key, k1 = jax.random.split(key)
        scale = 1.0 / np.sqrt(sizes[i])
        params.append({
            "W": jax.random.normal(k1, (sizes[i], sizes[i + 1])) * scale,
            "b": jnp.zeros(sizes[i + 1]),
            "ln_g": jnp.ones(sizes[i + 1]),
            "ln_b": jnp.zeros(sizes[i + 1]),
        })
    return params


def mlp_stack(params, x):
    for i, layer in enumerate(params):
        x = x @ layer["W"] + layer["b"]
        if i < len(params) - 1:
            mu = jnp.mean(x, axis=-1, keepdims=True)
            sd = jnp.std(x, axis=-1, keepdims=True) + 1e-6
            x = (x - mu) / sd * layer["ln_g"] + layer["ln_b"]
            x = jax.nn.relu(x)
    return x


def example_comb_nn(args):
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.functional import signal_gallery

    nfft = args.nfft
    M = nfft // 2 + 1
    delay_lengths = (151, 211, 239, 317)
    ch = len(delay_lengths)
    n_sections, n_param = 1, 2  # lowpass: (fc, gain)

    LossyBiquad = make_lossy_biquad_class(dsp)

    # ---- the DDSP comb: delays feedforward, lossy biquads feedback ----
    delays = dsp.parallelDelay(size=(ch,), max_len=max(delay_lengths),
                               nfft=nfft, isint=True)
    delays = delays.assign_value(
        delays.sample2s(jnp.asarray(delay_lengths, jnp.float32)))
    filt = LossyBiquad(size=(ch, ch), n_sections=n_sections,
                       filter_type="lowpass", nfft=nfft, fs=args.samplerate,
                       requires_grad=True)
    comb = system.Recursion(fF=delays, fB=filt)
    shell = system.Shell(core=comb, input_layer=dsp.FFT(nfft),
                         output_layer=dsp.Transform(jnp.abs))

    # map constraint sanity (the whole point of LossyBiquad)
    mapped = filt.map(filt.param)
    assert float(mapped[:, 1].max()) <= -0.1 + 1e-6, "gain must stay < 0 dB"

    # ---- dataset: closed-loop magnitudes for random biquad instances ----
    # (reference Dataset :28-71 — targets generated with the model itself)
    num = args.num
    key = jax.random.PRNGKey(args.seed)
    raw_params = jax.random.normal(
        key, (num, n_sections, n_param, ch, ch)) * 2.0
    imp = signal_gallery(1, nfft, ch, "impulse")

    def render(raw):
        return shell(imp, ext_param={"feedback": raw})[0]  # (M, ch)

    targets = jax.lax.map(render, raw_params)  # (num, M, ch)

    # ---- the hyper-network: target magnitude -> biquad raw params ----
    mlp_params = init_mlp_stack(jax.random.PRNGKey(args.seed + 1),
                                in_dim=M * ch,
                                out_dim=n_sections * n_param * ch * ch)

    def predict(mlp_p, target_mag):  # (M, ch) -> (K, P, ch, ch)
        flat = target_mag.reshape(-1)
        out = mlp_stack(mlp_p, flat)
        return out.reshape(n_sections, n_param, ch, ch)

    def batched_forward(mlp_p, target_mags):
        # vmap over the batch: one compiled program, no Python loop
        def one(t):
            return shell(imp, ext_param={"feedback": predict(mlp_p, t)})[0]
        return jax.vmap(one)(target_mags)

    def loss_fn(mlp_p, target_mags):
        est = batched_forward(mlp_p, target_mags)
        return jnp.mean((est - target_mags) ** 2)

    tx = optax.adam(args.lr)
    opt_state = tx.init(mlp_params)

    @jax.jit
    def step(mlp_p, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(mlp_p, batch)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(mlp_p, updates), opt_state, loss

    bs = max(1, args.batch_size)
    loss0 = float(loss_fn(mlp_params, targets[:bs]))
    losses = []
    for epoch in range(args.max_epochs):
        for i in range(0, num - bs + 1, bs):
            mlp_params, opt_state, loss = step(
                mlp_params, opt_state, targets[i:i + bs])
        losses.append(float(loss))
        print(f"epoch {epoch}: comb_nn loss {losses[-1]:.6f}")
    print(f"e4_recursion_nn[comb_nn] loss: {loss0:.6f} -> {losses[-1]:.6f}")
    assert losses[-1] < loss0, "hyper-network failed to improve"

    # ---- estimation plot (reference :297-315) ----
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    est = batched_forward(mlp_params, targets[:1])
    freq_axis = np.fft.rfftfreq(nfft, 1 / args.samplerate)
    fig, ax = plt.subplots()
    ax.plot(freq_axis,
            20 * np.log10(np.maximum(np.asarray(targets[0, :, 0]), 1e-12)),
            label="target")
    ax.plot(freq_axis,
            20 * np.log10(np.maximum(np.asarray(est[0, :, 0]), 1e-12)),
            label="estimation")
    ax.set_xlabel("Frequency (Hz)")
    ax.set_ylabel("Magnitude (dB)")
    ax.legend()
    fig.savefig(os.path.join(args.train_dir, "estimation.png"))
    plt.close(fig)


def example_gains_nn(args):
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.functional import signal_gallery

    nfft = args.nfft
    N = 2

    # inner DSP: comb-like Recursion of delays vs attenuation gains
    delays = dsp.parallelDelay(size=(N,), max_len=200, isint=True, nfft=nfft)
    gains = dsp.parallelGain(size=(N,), nfft=nfft, requires_grad=True)
    loop = system.Recursion(fF=delays, fB=gains)
    core = system.Series(OrderedDict({
        "ig": dsp.Gain(size=(N, 1), nfft=nfft),
        "loop": loop,
        "og": dsp.Gain(size=(1, N), nfft=nfft),
    }))
    shell = system.Shell(core=core, input_layer=dsp.FFT(nfft),
                         output_layer=dsp.Transform(lambda z: jnp.abs(z)))

    # outer MLP predicting the attenuation gains from a conditioning scalar
    def init_mlp(key, sizes=(1, 16, N)):
        params = []
        for i in range(len(sizes) - 1):
            key, k1, k2 = jax.random.split(key, 3)
            params.append((jax.random.normal(k1, (sizes[i], sizes[i + 1]))
                           * 0.5, jnp.zeros(sizes[i + 1])))
        return params

    def mlp(params, c):
        h = c
        for i, (W, b) in enumerate(params):
            h = h @ W + b
            if i < len(params) - 1:
                h = jax.nn.tanh(h)
        return jax.nn.sigmoid(h) * 0.9  # stable loop gains < 0.9

    x = signal_gallery(1, nfft, 1, "impulse")
    cond = jnp.asarray([[0.7]])
    target_decay = 0.3

    def loss_fn(mlp_params):
        g = mlp(mlp_params, cond)[0]
        est = shell(x, ext_param={"loop.feedback": g})
        # drive the loop's magnitude response toward a flat target level
        return jnp.mean((est - target_decay) ** 2)

    params = init_mlp(jax.random.PRNGKey(args.seed))
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss0 = float(loss_fn(params))
    for _ in range(args.max_epochs * 10):
        params, opt_state, loss = step(params, opt_state)
    print(f"e4_recursion_nn[gains_nn] loss: {loss0:.5f} -> {float(loss):.5f}")
    assert float(loss) < loss0


def main(args):
    scenarios = {"comb_nn": example_comb_nn, "gains_nn": example_gains_nn}
    names = list(scenarios) if args.scenario == "all" else [args.scenario]
    for name in names:
        print(f"--- e4_recursion_nn scenario: {name} ---")
        scenarios[name](args)


if __name__ == "__main__":
    ap = example_parser(nfft=4096, max_epochs=3, num=16, batch_size=4,
                        lr=1e-3)
    ap.add_argument("--scenario", type=str, default="all",
                    choices=["comb_nn", "gains_nn", "all"])
    args = setup(ap.parse_args())
    main(args)
