"""Loss landscape diagnostics (reference examples/e9_loss_profile.py):
LossProfile over the FDN attenuation, LossSurface over two parameters."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp
import numpy as np

from _common import example_parser, setup


def main(args):
    from flamo_tpu.auxiliary.config import HomogeneousFDNConfig
    from flamo_tpu.auxiliary.reverb import HomogeneousFDN
    from flamo_tpu.optimize.loss import mse_loss
    from flamo_tpu.optimize.surface import (
        LossConfig, LossProfile, LossSurface, ParameterConfig,
    )
    from flamo_tpu.functional import signal_gallery
    from flamo_tpu.processor import dsp

    nfft = args.nfft
    cfg = HomogeneousFDNConfig(N=4, nfft=nfft, delays=[89, 97, 107, 113],
                               alias_decay_db=0)
    fdn = HomogeneousFDN(cfg)
    model = fdn.model.set_outputLayer(
        dsp.Transform(lambda z: jnp.abs(z)))
    # output layer above consumes spectra; swap input to FFT domain
    model = model.set_inputLayer(dsp.FFT(nfft))

    x = signal_gallery(1, nfft, 1, "impulse")
    target = jnp.ones((1, nfft // 2 + 1, 1))

    profile_cfg = LossConfig(
        criteria=[mse_loss(nfft=nfft)],
        param_config=[ParameterConfig(
            key="feedback_loop.feedforward.attenuation",
            lower_bound=-3.0, upper_bound=6.0, n_steps=9,
            param_map=lambda v: v * jnp.ones(4), target_value=None,
        )],
        n_runs=2,
        perturb_param="input_gain",
        output_dir=args.train_dir,
    )
    lp = LossProfile(model, profile_cfg)
    loss = lp.compute_loss(x, target)
    print("loss profile:", loss.shape, "min:", float(loss.min()))
    lp.plot_loss(loss)

    surface_cfg = LossConfig(
        criteria=[mse_loss(nfft=nfft)],
        param_config=[
            ParameterConfig(key="feedback_loop.feedforward.attenuation",
                            lower_bound=-2.0, upper_bound=4.0, n_steps=4,
                            param_map=lambda v: v * jnp.ones(4)),
            ParameterConfig(key="input_gain",
                            lower_bound=-1.0, upper_bound=1.0, n_steps=4,
                            param_map=lambda v: v * jnp.ones((4, 1))),
        ],
        n_runs=1,
        output_dir=args.train_dir,
    )
    ls = LossSurface(model, surface_cfg)
    loss2 = ls.compute_loss(x, target)
    print("loss surface:", loss2.shape)
    ls.plot_loss(loss2)
    assert np.isfinite(loss).all() and np.isfinite(loss2).all()


if __name__ == "__main__":
    args = setup(example_parser(nfft=2048).parse_args())
    main(args)
