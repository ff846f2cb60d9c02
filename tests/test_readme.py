"""Executes the README quick-start (scaled down) so the docs can't rot."""

from collections import OrderedDict

import jax.numpy as jnp
import numpy as np

import flamo_tpu
from flamo_tpu.processor import dsp, system
from flamo_tpu.optimize import Trainer, DatasetColorless, load_dataset
from flamo_tpu.optimize.loss import mse_loss, sparsity_loss


def test_readme_quickstart(tmp_path):
    flamo_tpu.set_seed(130709)
    nfft, N = 2048, 6
    delays = (89, 97, 107, 113, 127, 131)

    delay = dsp.parallelDelay(size=(N,), max_len=max(delays), nfft=nfft,
                              isint=True, alias_decay_db=30)
    delay = delay.assign_value(
        delay.sample2s(jnp.asarray(delays, jnp.float32)))
    mix = dsp.Matrix(size=(N, N), nfft=nfft, matrix_type="orthogonal",
                     requires_grad=True, alias_decay_db=30)
    core = system.Series(OrderedDict({
        "input_gain": dsp.Gain(size=(N, 1), nfft=nfft, requires_grad=True,
                               alias_decay_db=30),
        "feedback_loop": system.Recursion(fF=delay, fB=mix),
        "output_gain": dsp.Gain(size=(1, N), nfft=nfft, requires_grad=True,
                                alias_decay_db=30),
    }))
    model = system.Shell(core=core, input_layer=dsp.FFT(nfft),
                         output_layer=dsp.Transform(lambda z: jnp.abs(z)))

    dataset = DatasetColorless(input_shape=(1, nfft // 2 + 1, 1),
                               target_shape=(1, nfft // 2 + 1, 1), expand=8)
    train, valid = load_dataset(dataset, batch_size=2, seed=0)
    trainer = Trainer(model, max_epochs=2, lr=1e-3,
                      train_dir=str(tmp_path))
    trainer.register_criterion(mse_loss(nfft=nfft), 1)
    trainer.register_criterion(sparsity_loss(), 0.2, requires_model=True)
    trainer.train(train, valid)

    ir = trainer.net.get_time_response(fs=48000)
    assert ir.shape == (1, nfft, 1)
    assert np.isfinite(np.asarray(ir)).all()
