"""LossProfile / LossSurface unit tests."""

import jax.numpy as jnp
import numpy as np

import flamo_tpu
from flamo_tpu.models import build_colorless_fdn
from flamo_tpu.optimize.loss import mse_loss
from flamo_tpu.optimize.surface import (
    LossConfig, LossProfile, LossSurface, ParameterConfig,
)

NFFT = 1024
DELAYS = (13, 17, 19, 23, 29, 31)


def _setup():
    flamo_tpu.set_seed(0)
    model = build_colorless_fdn(nfft=NFFT, delays=DELAYS)
    x = jnp.zeros((1, NFFT, 1)).at[:, 0, :].set(1.0)
    target = jnp.ones((1, NFFT // 2 + 1, 1))
    return model, x, target


def test_loss_profile_scan_and_accuracy(tmp_path):
    model, x, target = _setup()
    cfg = LossConfig(
        criteria=[mse_loss(nfft=NFFT)],
        param_config=[ParameterConfig(
            key="input_gain", lower_bound=-1.0, upper_bound=1.0, n_steps=5,
            param_map=lambda v: v * jnp.ones((6, 1)), target_value=0.5)],
        n_runs=2,
        perturb_param="output_gain",
        output_dir=str(tmp_path),
    )
    lp = LossProfile(model, cfg)
    loss = lp.compute_loss(x, target)
    assert loss.shape == (2, 5, 1)
    assert np.isfinite(loss).all()
    acc = lp.compute_accuracy(loss)
    assert acc.shape == (5, 1)
    fig, _ = lp.plot_loss(loss)
    import os

    assert os.path.exists(os.path.join(str(tmp_path), "input_gain.png"))


def test_loss_surface_scan(tmp_path):
    model, x, target = _setup()
    cfg = LossConfig(
        criteria=[mse_loss(nfft=NFFT)],
        param_config=[
            ParameterConfig(key="input_gain", lower_bound=-1.0,
                            upper_bound=1.0, n_steps=3,
                            param_map=lambda v: v * jnp.ones((6, 1))),
            ParameterConfig(key="output_gain", lower_bound=-1.0,
                            upper_bound=1.0, n_steps=3,
                            param_map=lambda v: v * jnp.ones((1, 6))),
        ],
        n_runs=1,
        output_dir=str(tmp_path),
    )
    ls = LossSurface(model, cfg)
    loss = ls.compute_loss(x, target)
    assert loss.shape == (1, 3, 3, 1)
    assert np.isfinite(loss).all()
    # gains scale the output quadratically: loss should vary over the grid
    assert loss.std() > 0


def test_loss_surface_compute_accuracy_synthetic_bowl():
    """2-D accuracy (reference surface.py:631-655): a synthetic bowl whose
    minimum sits at the target grid point must give accuracy 1 everywhere
    except the target itself (strict >)."""
    model, _, _ = _setup()
    cfg = LossConfig(
        criteria=[mse_loss(nfft=NFFT)],
        param_config=[
            ParameterConfig(key="input_gain", lower_bound=-1.0,
                            upper_bound=1.0, n_steps=5, target_value=0.0,
                            param_map=lambda v: v * jnp.ones((6, 1))),
            ParameterConfig(key="output_gain", lower_bound=-1.0,
                            upper_bound=1.0, n_steps=7, target_value=0.5,
                            param_map=lambda v: v * jnp.ones((1, 6))),
        ],
        n_runs=3,
    )
    ls = LossSurface(model, cfg)
    s0 = np.asarray(ls.steps_0)          # target index 2 (value 0.0)
    s1 = np.asarray(ls.steps_1)          # closest to 0.5 -> index 4
    t0, t1 = np.abs(s0).argmin(), np.abs(s1 - 0.5).argmin()
    loss = ((s0[None, :, None, None] - s0[t0]) ** 2
            + (s1[None, None, :, None] - s1[t1]) ** 2
            + np.zeros((3, 1, 1, 1)))    # perfect bowl, all runs equal
    acc = ls.compute_accuracy(loss)
    assert acc.shape == (5, 7, 1)
    assert acc[t0, t1, 0] == 0.0         # strict >: target point is 0
    mask = np.ones_like(acc, bool)
    mask[t0, t1, 0] = False
    assert (acc[mask] == 1.0).all()


def test_set_raw_parameter_nested_key():
    model, x, target = _setup()
    cfg = LossConfig(
        criteria=[mse_loss(nfft=NFFT)],
        param_config=[ParameterConfig(
            key="feedback_loop.feedback", lower_bound=0.0, upper_bound=1.0,
            n_steps=2, param_map=lambda v: v * jnp.ones((6, 6)))],
        n_runs=1,
    )
    lp = LossProfile(model, cfg)
    lp.set_raw_parameter("feedback_loop.feedback", jnp.asarray(0.5),
                         map=lambda v: v * jnp.ones((6, 6)))
    A = lp.net.get_core().feedback_loop.feedback.param
    assert np.allclose(np.asarray(A), 0.5)
