"""Model-family builders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_active_acoustics_class_workflow():
    """Full AA workflow (reference e8_active_acoustics.py:26-332):
    GBI at G=1, set_G_to_GBI drives max |eig| to 1, normalize_U,
    system_simulation, adopt round-trip."""
    import jax.numpy as jnp
    from flamo_tpu.models import ActiveAcoustics

    aa = ActiveAcoustics(n_S=1, n_M=2, n_L=3, n_A=1, nfft=512,
                         FIR_order=8, wgn_RT=0.05, room_t60=0.05)
    # constructor ends with set_G_to_GBI -> loop at the stability edge
    evs = aa.get_F_MM_eigenvalues()
    assert evs.shape == (1, 257, 2)
    np.testing.assert_allclose(float(jnp.abs(evs).max()), 1.0, rtol=1e-4)

    # GBI is defined at G=1 and restores the current gain afterwards
    g_before = np.asarray(aa.G.param).copy()
    gbi = float(aa.get_current_GBI())
    np.testing.assert_allclose(np.asarray(aa.G.param), g_before)
    aa.set_G(1.0)
    max_ev = float(jnp.abs(aa.get_F_MM_eigenvalues()).max())
    np.testing.assert_allclose(gbi, 1.0 / max_ev, rtol=1e-5)

    aa.normalize_U(2.0)
    np.testing.assert_allclose(
        float(jnp.sqrt(jnp.sum(aa.U.param ** 2))), 2.0, rtol=1e-5)

    y = aa.system_simulation()
    assert y.shape == (1, 512, 1)
    assert np.isfinite(np.asarray(y)).all()
    assert float(jnp.abs(y).max()) > 0

    # adopt: pull modules back from a (re-built) trained shell
    shell = aa.F_MM
    aa2 = ActiveAcoustics(n_S=1, n_M=2, n_L=3, n_A=1, nfft=512,
                          FIR_order=8, wgn_RT=0.05, room_t60=0.05)
    aa2.adopt(shell)
    np.testing.assert_allclose(np.asarray(aa2.U.param),
                               np.asarray(aa.U.param))


def test_active_acoustics_trains_mse_evs():
    """Training the F_MM shell with the differentiable eigenvalue loss
    reduces it (the reference's MSE_evs objective)."""
    import jax.numpy as jnp
    from flamo_tpu.models import ActiveAcoustics
    from flamo_tpu.optimize import DatasetColorless, Trainer, load_dataset
    from flamo_tpu.optimize.loss import mse_evs

    nfft = 512
    M = nfft // 2 + 1
    aa = ActiveAcoustics(n_S=1, n_M=2, n_L=2, n_A=1, nfft=nfft,
                         FIR_order=8, wgn_RT=0.05, room_t60=0.05)
    ds = DatasetColorless(input_shape=(1, M, 2), target_shape=(1, M, 2),
                          expand=8)
    tl, vl = load_dataset(ds, batch_size=1, split=0.75, shuffle=False)
    tr = Trainer(aa.F_MM, max_epochs=3, lr=1e-2, log=False)
    tr.register_criterion(mse_evs(iter_num=len(tl), freq_points=M), 1)
    tr.train(tl, vl)
    assert np.isfinite(tr.train_loss).all()
    assert tr.train_loss[-1] < tr.train_loss[0]
    aa.adopt(tr.net)
    assert np.isfinite(float(aa.get_current_GBI()))


@pytest.mark.slow
def test_aa_evs_train_step_matches_mse_evs():
    """The linop-composed eigenvalue training step (aa_evs_train_step)
    matches the module-graph F_MM forward + optimize.mse_evs loss on the
    full spectrum (iter_num=1: identical single partition), and training
    decreases the loss over partition cycles."""
    import flamo_tpu
    from flamo_tpu.models.active_acoustics import (ActiveAcoustics,
                                                   aa_evs_train_step)
    from flamo_tpu.optimize.loss import mse_evs

    flamo_tpu.set_seed(42)
    aa = ActiveAcoustics(n_S=1, n_M=2, n_L=3, n_A=1, nfft=512, FIR_order=8,
                         rir_length=128, wgn_RT=0.1, room_t60=0.1)
    M = 512 // 2 + 1
    tg = jnp.full((M, 2), 0.3, dtype=jnp.float32)

    x = jnp.zeros((1, 512, 2)).at[:, 0, :].set(1.0)
    y_pred = aa.F_MM(x)
    crit1 = mse_evs(iter_num=1, freq_points=M)
    l_ref = float(crit1(y_pred, tg[None], step=0))

    multi1, opt1, er1, ei1 = aa_evs_train_step(aa, tg, lr=1e-3, iter_num=1)
    er1, ei1 = jnp.asarray(er1), jnp.asarray(ei1)
    l_cmp = float(jax.jit(
        lambda m, o, er, ei, tg: multi1(m, o, er, ei, tg, 0, 1)[2][-1])(
            aa.F_MM, opt1, er1, ei1, tg))
    assert abs(l_cmp - l_ref) / abs(l_ref) < 1e-4

    multi, opt_state, er, ei = aa_evs_train_step(aa, tg, lr=1e-3, iter_num=4)
    er, ei = jnp.asarray(er), jnp.asarray(ei)
    run = jax.jit(lambda m, o, er, ei, tg, k: multi(m, o, er, ei, tg, 0, k),
                  static_argnums=(5,))
    l0 = float(run(aa.F_MM, opt_state, er, ei, tg, 1)[2][-1])
    l40 = float(run(aa.F_MM, opt_state, er, ei, tg, 40)[2][-1])
    assert l40 < l0


def test_sfdn_builder_and_masked_step_lockstep():
    """The scattering-FDN masked-bin fast path (models.sfdn_masked_train_step)
    trains in lockstep with the graph step: identical objective, identical
    mask schedule, closed loop solved only at each step's masked bins
    (reference examples/e8_colorless_sfdn.py:29-152)."""
    from flamo_tpu.models import build_colorless_sfdn
    from flamo_tpu.models.scattering_fdn import (sfdn_masked_train_step,
                                                 sfdn_train_step)
    from flamo_tpu.utils import host_eager

    nfft = 2048
    M = nfft // 2 + 1
    flamo_tpu.set_seed(42)
    with host_eager():
        m = build_colorless_sfdn(nfft=nfft,
                                 delays=(197, 229, 253, 307, 331, 389))
        flamo_tpu.set_seed(7)
        s_graph, o_graph = sfdn_train_step(m, n_samples=128)
        flamo_tpu.set_seed(7)
        s_masked, o_masked = sfdn_masked_train_step(m, n_samples=128)
    x = jnp.zeros((1, M, 1)).at[:, 0, :].set(1.0)
    t = jnp.ones((1, M, 1))
    jg = jax.jit(s_graph)
    jm = jax.jit(s_masked)
    mg, og, mm_, om = m, o_graph, m, o_masked
    losses_g, losses_m = [], []
    for i in range(4):
        mg, og, lg = jg(mg, og, x, t, jnp.asarray(i))
        mm_, om, lm = jm(mm_, om, x, t, jnp.asarray(i))
        losses_g.append(float(lg))
        losses_m.append(float(lm))
    # lockstep trajectories (identical masks + math, f32 determinism)
    np.testing.assert_allclose(losses_m, losses_g, rtol=1e-5)
    assert np.isfinite(losses_g).all()
    # trained parameters stay lockstep too
    lg = jax.tree_util.tree_leaves(mg)
    lm = jax.tree_util.tree_leaves(mm_)
    for a, b in zip(lg, lm):
        if hasattr(a, "dtype") and jnp.issubdtype(
                jnp.asarray(a).dtype, jnp.floating):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


def test_sfdn_masked_fit_decreases():
    """models.sfdn_fit(masked=True) — the e8 sfdn example's accelerator
    fast path — trains the masked objective down."""
    from flamo_tpu.models import build_colorless_sfdn, sfdn_fit
    from flamo_tpu.utils import host_eager

    flamo_tpu.set_seed(3)
    with host_eager():
        m = build_colorless_sfdn(nfft=1024, delays=(97, 113, 127, 149),
                                 n_stages=2)
    trained, hist = sfdn_fit(m, n_steps=30, lr=1e-2, n_samples=64,
                             steps_per_call=15, masked=True)
    assert hist.shape == (30,)
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]
