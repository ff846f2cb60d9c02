"""The attenuated-FDN workload (reference examples/e8_fdn.py:32-184):
delays feed forward, Series(orthogonal mixing, per-delay-line GEQ
attenuation) feeds back — the reference's realistic room-matching FDN.

Alongside the generic module-graph path this file wires the fused
single-pass Pallas step (:func:`ops.pallas_solve.pallas_fdn_sos_tf_mse`):
the GEQ band design (small (K, N) XLA math) runs per step, but the SOS
cascade evaluation, loop solve, projections, loss, and all cotangents
stay in vector registers.
"""

from __future__ import annotations

from collections import OrderedDict
import functools

import jax
import jax.numpy as jnp
import optax

from flamo_tpu.core import masked_optimizer
from flamo_tpu.processor import dsp, system

DEFAULT_DELAYS = (887, 911, 941, 1699, 1951, 2053)


def _sigmoid_db_map(p):
    """Command-gain map used by the e8_fdn-style attenuation GEQ:
    raw param -> sigmoid in (0, 1) -> dB (always attenuating)."""
    return 20 * jnp.log10(jax.nn.sigmoid(p))


def build_attenuated_fdn(nfft: int = 96000, delays=DEFAULT_DELAYS,
                         octave_interval: int = 1,
                         alias_decay_db: float = 0.0,
                         dtype=jnp.float32,
                         solve_method: str = "ge",
                         cascade_backend: str = "xla",
                         cache_delays: bool = False,
                         key=None) -> system.Shell:
    """Shell(FFT -> [Gain, Recursion(parallelDelay,
    Series(orthogonal Matrix, sigmoid-mapped parallelGEQ)), Gain])
    (reference e8_fdn.py:32-184, GEQ attenuation variant).

    cache_delays=True wraps the (frozen) delay lines in
    :class:`dsp.CachedResponse` so the (M, N) e^{-j omega d} response is
    computed once instead of per training step (same trade as the
    colorless builder; only valid while the delays stay frozen)."""
    from flamo_tpu.utils import next_key

    N = len(delays)
    key = next_key(key)
    keys = jax.random.split(key, 5)
    dl = dsp.parallelDelay(size=(N,), max_len=int(max(delays)), nfft=nfft,
                           isint=True, requires_grad=False,
                           alias_decay_db=alias_decay_db, dtype=dtype,
                           key=keys[0])
    dl = dl.assign_value(dl.sample2s(jnp.asarray(delays, dtype=dtype)))
    if cache_delays:
        dl = dsp.CachedResponse(dl)
    mix = dsp.Matrix(size=(N, N), nfft=nfft, matrix_type="orthogonal",
                     requires_grad=True, alias_decay_db=alias_decay_db,
                     dtype=dtype, key=keys[1])
    att = dsp.parallelGEQ(size=(N,), octave_interval=octave_interval,
                          nfft=nfft, fs=48000, map=_sigmoid_db_map,
                          requires_grad=True,
                          alias_decay_db=alias_decay_db, dtype=dtype,
                          key=keys[2], cascade_backend=cascade_backend)
    fb = system.Series(OrderedDict(
        {"mixing_matrix": mix, "attenuation": att}))
    loop = system.Recursion(fF=dl, fB=fb, solve_method=solve_method)
    core = system.Series(OrderedDict({
        "input_gain": dsp.Gain(size=(N, 1), nfft=nfft, requires_grad=True,
                               alias_decay_db=alias_decay_db, dtype=dtype,
                               key=keys[3]),
        "feedback_loop": loop,
        "output_gain": dsp.Gain(size=(1, N), nfft=nfft, requires_grad=True,
                                alias_decay_db=alias_decay_db, dtype=dtype,
                                key=keys[4]),
    }))
    return system.Shell(core=core, input_layer=dsp.FFT(nfft, dtype=dtype))


def attenuated_loss(model, inputs, targets):
    """Plain magnitude-MSE through the module graph (the loss of the
    attenuated bench workload)."""
    return jnp.mean((jnp.abs(model(inputs)) - targets) ** 2)


def extract_attenuated_operands(model):
    """Pull (D, bt, at, U, b, c) for
    :func:`ops.pallas_solve.pallas_fdn_sos_tf_mse` out of a Shell whose
    core is Series(Gain(N,1), Recursion(diag feedforward,
    Series(Matrix, parallelGEQ)), Gain(1,N)).

    bt/at are the (3, K, N) GEQ SOS taps WITH the alias envelope folded
    in (gamma^[0,1,2]) — exactly the taps the module's XLA response path
    feeds to cascade_prods, so gradients flow into the command-gain
    params through the band design by ordinary jax.grad."""
    core = model.get_core()
    loop = core.feedback_loop
    M = model.nfft // 2 + 1
    kD, D = loop.feedforward.matrix_response()
    if kD != "diag":
        raise ValueError(
            "extract_attenuated_operands needs a diagonal feedforward, "
            f"got matrix_response kind {kD!r}")
    D = jnp.broadcast_to(D, (M, D.shape[-1]))
    fb = loop.feedback
    mix = fb.mixing_matrix
    att = fb.attenuation
    U = jnp.real(mix.matrix_response()[1])
    bt, at = att._design(att.map(att.param))
    env = (jnp.asarray(att.gamma, att.dtype)
           ** jnp.arange(3, dtype=att.dtype)).reshape(3, 1, 1)
    b = jnp.real(core.input_gain.matrix_response()[1])[:, 0]
    c = jnp.real(core.output_gain.matrix_response()[1])[0, :]
    return D, bt * env, at * env, U, b, c


def attenuated_loss_fused_step(model, inputs, targets, pivot: bool = False):
    """attenuated_loss through
    :func:`ops.pallas_solve.pallas_fdn_sos_tf_mse` — SOS attenuation
    evaluation, loop solve, projections, |tf X|, loss AND all cotangents
    in ONE Pallas grid pass.  Only the GEQ band design ((K, N) scalars)
    and the parameter maps (expm, sigmoid) stay in XLA.

    Requires the canonical single-batch SISO workload shapes
    (inputs (1, T, 1), targets (1, M, 1))."""
    from flamo_tpu.ops.pallas_solve import pallas_fdn_sos_tf_mse

    if (inputs.shape[0] != 1 or inputs.shape[-1] != 1
            or targets.shape[0] != 1 or targets.shape[-1] != 1):
        raise ValueError("fused_step needs batch == channels == 1, got "
                         f"inputs {inputs.shape}, targets {targets.shape}")
    D, bt, at, U, b, c = extract_attenuated_operands(model)
    X = jnp.fft.rfft(inputs[0, :, 0], n=model.nfft)
    loop = model.get_core().feedback_loop
    ff_trainable = bool(getattr(loop.feedforward, "trainable", False))
    return pallas_fdn_sos_tf_mse(D, bt, at, U, b, c, X,
                                 targets[0, :, 0], nfft=model.nfft,
                                 with_dbar=ff_trainable, pivot=pivot)


def attenuated_train_step(model, lr: float = 1e-4, fused_step: bool = False,
                          step_pivot: bool = False):
    """Build (jittable_step, opt_state) for this workload.  fused_step=True
    swaps the forward for :func:`attenuated_loss_fused_step` (gate the
    no-pivot default on a finite-loss check, as bench does)."""
    tx = masked_optimizer(optax.adam(lr), model)
    opt_state = tx.init(model)
    loss_fn = (functools.partial(attenuated_loss_fused_step,
                                 pivot=step_pivot)
               if fused_step else attenuated_loss)

    def step(model, opt_state, inputs, targets):
        loss, grads = jax.value_and_grad(loss_fn)(model, inputs, targets)
        updates, opt_state = tx.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    return step, opt_state
