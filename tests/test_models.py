"""Model-family builders."""

import jax
import jax.numpy as jnp
import numpy as np

import flamo_tpu
from flamo_tpu.models import (
    build_active_acoustics, build_colorless_fdn, colorless_train_step,
    gain_before_instability, gain_before_instability_diff,
)


def test_colorless_builder_shapes():
    flamo_tpu.set_seed(0)
    m = build_colorless_fdn(nfft=1024, delays=(13, 17, 19, 23, 29, 31))
    x = jnp.zeros((1, 1024, 1)).at[:, 0, :].set(1.0)
    y = jax.jit(lambda m, x: m(x))(m, x)
    assert y.shape == (1, 513, 1)
    assert (np.asarray(y) >= 0).all()  # abs output layer


def test_active_acoustics_builder_and_gbi():
    flamo_tpu.set_seed(1)
    m = build_active_acoustics(n_mics=2, n_loudspeakers=3, rir_length=512,
                               fir_order=16, nfft=2048, fs=8000, t60=0.05)
    x = jnp.zeros((1, 2048, 3)).at[:, 0, :].set(1.0)
    y = m(x)
    assert y.shape == (1, 1025, 2)
    gbi = float(gain_before_instability(m, subsample=64))
    assert np.isfinite(gbi)
    # tiny mixer init -> loop far from instability -> large positive GBI
    assert gbi > 0
    # the on-device differentiable GBI must agree with host-eig GBI and
    # admit gradients w.r.t. the mixer parameters
    gbi_d = float(jax.jit(
        lambda m: gain_before_instability_diff(m, subsample=64, iters=128)
    )(m))
    assert abs(gbi_d - gbi) < 0.2  # dB

    def loss(mm):
        return -gain_before_instability_diff(mm, subsample=64, iters=32)

    grads = jax.grad(loss)(m)
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_active_acoustics_trains():
    flamo_tpu.set_seed(2)
    m = build_active_acoustics(n_mics=2, n_loudspeakers=3, rir_length=256,
                               fir_order=8, nfft=1024, fs=8000, t60=0.03)
    import optax
    from flamo_tpu.core import trainable_mask

    x = jnp.zeros((1, 1024, 3)).at[:, 0, :].set(1.0)
    target = jnp.ones((1, 513, 2))
    tx = optax.adam(1e-2)
    mask = trainable_mask(m)
    opt_state = tx.init(m)

    def loss_fn(m):
        est = jnp.abs(m(x))
        return jnp.mean((est - target) ** 2)

    @jax.jit
    def step(m, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(m)
        g = jax.tree_util.tree_map(
            lambda gr, msk: gr if msk else jnp.zeros_like(gr), g, mask)
        updates, opt_state = tx.update(g, opt_state, m)
        return optax.apply_updates(m, updates), opt_state, loss

    loss0 = float(loss_fn(m))
    for _ in range(20):
        m, opt_state, loss = step(m, opt_state)
    assert float(loss) < loss0
    # the room (non-trainable) is untouched
    assert not m.get_core().feedforward.trainable


def test_colorless_cache_delays_equivalent():
    flamo_tpu.set_seed(3)
    key = jax.random.PRNGKey(7)
    m0 = build_colorless_fdn(nfft=1024, delays=(13, 17, 19, 23, 29, 31),
                             cache_delays=False, key=key)
    m1 = build_colorless_fdn(nfft=1024, delays=(13, 17, 19, 23, 29, 31),
                             cache_delays=True, key=key)
    x = jnp.zeros((1, 1024, 1)).at[:, 0, :].set(1.0)
    y0 = np.asarray(jax.jit(lambda m, x: m(x))(m0, x))
    y1 = np.asarray(jax.jit(lambda m, x: m(x))(m1, x))
    assert np.abs(y0 - y1).max() < 1e-5
