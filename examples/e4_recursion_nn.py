"""Hyper-conditioning (reference examples/e4_recursion_nn.py): an outer
neural network predicts DSP parameters and injects them through
``ext_param`` — purely functional in flamo_tpu (no write-back)."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from collections import OrderedDict

import jax
import jax.numpy as jnp
import optax

from _common import example_parser, setup


def main(args):
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.functional import signal_gallery

    nfft = args.nfft
    N = 2
    M = nfft // 2 + 1

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
    print(f"hyper-conditioned loss: {loss0:.5f} -> {float(loss):.5f}")
    assert float(loss) < loss0


if __name__ == "__main__":
    args = setup(example_parser(nfft=4096, max_epochs=3).parse_args())
    main(args)
