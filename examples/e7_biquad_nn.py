"""NN-predicted biquad parameters via ext_param (reference
examples/e7_biquad_nn.py)."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import optax

from _common import example_parser, setup


def main(args):
    from flamo_tpu.processor import dsp, system
    from flamo_tpu.functional import highpass_filter, biquad2tf, signal_gallery

    nfft = args.nfft
    M = nfft // 2 + 1
    K = 2  # sections

    filt = dsp.Biquad(size=(1, 1), n_sections=K, filter_type="highpass",
                      nfft=nfft, fs=args.samplerate, requires_grad=False)
    shell = system.Shell(core=system.Series({"bq": filt}),
                         input_layer=dsp.FFT(nfft),
                         output_layer=dsp.Transform(lambda z: jnp.abs(z)))

    b, a = highpass_filter(fc=6000.0, gain=0.0, fs=args.samplerate)
    target = jnp.abs(biquad2tf(b, a, nfft))[None, :, None]
    x = signal_gallery(1, nfft, 1, "impulse")

    def init_mlp(key, sizes=(1, 32, K * 2)):
        params = []
        for i in range(len(sizes) - 1):
            key, k1 = jax.random.split(key)
            params.append((jax.random.normal(k1, (sizes[i], sizes[i + 1]))
                           * 0.3, jnp.zeros(sizes[i + 1])))
        return params

    def predict(params, c):
        h = c
        for i, (W, bb) in enumerate(params):
            h = h @ W + bb
            if i < len(params) - 1:
                h = jax.nn.tanh(h)
        raw = h.reshape(K, 2, 1, 1)
        fc = jax.nn.sigmoid(raw[:, 0:1])       # omega/pi in (0,1)
        g = jnp.exp(raw[:, 1:2])               # positive linear gain
        return jnp.concatenate([fc, g], axis=1)

    cond = jnp.asarray([[0.5]])

    def loss_fn(params):
        bq_param = predict(params, cond)
        est = shell(x, ext_param={"bq": bq_param})
        return jnp.mean((est - target) ** 2)

    params = init_mlp(jax.random.PRNGKey(args.seed))
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss0 = float(loss_fn(params))
    for _ in range(50):
        params, opt_state, loss = step(params, opt_state)
    print(f"NN->biquad loss: {loss0:.5f} -> {float(loss):.5f}")
    assert float(loss) < loss0


if __name__ == "__main__":
    args = setup(example_parser(nfft=4096).parse_args())
    main(args)
