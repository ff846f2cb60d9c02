"""The colorless-FDN flagship workload (reference examples/e8_colorless_fdn.py
:26-153; arXiv:2402.11216 'Optimizing Tiny Colorless Feedback Delay
Networks').

This is the BASELINE benchmark model (BASELINE.md): N=6 FDN, delays
[887, 911, 941, 1699, 1951, 2053], 30 dB alias decay, learnable orthogonal
feedback, trained so the magnitude response is flat (mse vs ones +
0.2 * sparsity of the mixing matrix).
"""

from __future__ import annotations

from collections import OrderedDict
import jax
import jax.numpy as jnp
import optax

from flamo_tpu.core import masked_optimizer
from flamo_tpu.processor import dsp, system
from flamo_tpu.optimize.loss import mse_loss, sparsity_loss
from flamo_tpu.utils import next_key

DEFAULT_DELAYS = (887, 911, 941, 1699, 1951, 2053)


def _abs(x):
    return jnp.abs(x)


def build_colorless_fdn(nfft: int = 96000, delays=DEFAULT_DELAYS,
                        alias_decay_db: float = 30.0, dtype=jnp.float32,
                        cache_delays: bool = False,
                        solve_method: str = "ge",
                        key=None) -> system.Shell:
    """Shell(FFT -> [Gain, Recursion(parallelDelay, orthogonal Matrix),
    Gain] -> abs) (reference e8_colorless_fdn.py:33-106).

    cache_delays=True wraps the (frozen) delay lines in
    :class:`dsp.CachedResponse`: the gamma^m e^{-j omega m} response is
    computed once instead of per training step (identical math; the module
    loses its raw ``param`` accessor)."""
    N = len(delays)
    key = next_key(key)
    keys = jax.random.split(key, 4)
    input_gain = dsp.Gain(size=(N, 1), nfft=nfft, requires_grad=True,
                          alias_decay_db=alias_decay_db, dtype=dtype,
                          key=keys[0])
    output_gain = dsp.Gain(size=(1, N), nfft=nfft, requires_grad=True,
                           alias_decay_db=alias_decay_db, dtype=dtype,
                           key=keys[1])
    delay_mod = dsp.parallelDelay(size=(N,), max_len=int(max(delays)),
                                  nfft=nfft, isint=True, requires_grad=False,
                                  alias_decay_db=alias_decay_db, dtype=dtype,
                                  key=keys[2])
    delay_mod = delay_mod.assign_value(
        delay_mod.sample2s(jnp.asarray(delays, dtype=dtype)))
    if cache_delays:
        delay_mod = dsp.CachedResponse(delay_mod)
    feedback = dsp.Matrix(size=(N, N), nfft=nfft, matrix_type="orthogonal",
                          requires_grad=True,
                          alias_decay_db=alias_decay_db, dtype=dtype,
                          key=keys[3])
    feedback_loop = system.Recursion(fF=delay_mod, fB=feedback,
                                     solve_method=solve_method)
    core = system.Series(OrderedDict({
        "input_gain": input_gain,
        "feedback_loop": feedback_loop,
        "output_gain": output_gain,
    }))
    return system.Shell(
        core=core,
        input_layer=dsp.FFT(nfft, dtype=dtype),
        output_layer=dsp.Transform(_abs, dtype=dtype),
    )


_MSE = mse_loss()
_SPARSITY = sparsity_loss()


def colorless_loss(model, inputs, targets, sparsity_weight: float = 0.2):
    """mse + 0.2 * sparsity (reference e8_colorless_fdn.py:137-138)."""
    est = model(inputs)
    return _MSE(est, targets) + sparsity_weight * _SPARSITY(est, targets,
                                                           model)


def extract_siso_tf_operands(model):
    """Pull the canonical SISO FDN transfer-function operands (D, U, b, c)
    out of a Shell whose core is Series(input Gain(N,1), Recursion with a
    diagonal feedforward, output Gain(1,N)).

    Returns arrays shaped for :func:`ops.pallas_solve.pallas_fdn_tf`:
    D (M, N) complex per-bin diagonal, U (N, N) real feedback matrix,
    b (N,) input projection, c (N,) output projection, such that
    tf(z) = c^T (I - diag(D) U)^{-1} diag(D) b."""
    core = model.get_core()
    loop = core.feedback_loop
    M = model.nfft // 2 + 1
    kD, D = loop.feedforward.matrix_response()
    if kD != "diag":
        raise ValueError(
            "extract_siso_tf_operands needs a diagonal feedforward, got "
            f"matrix_response kind {kD!r}")
    D = jnp.broadcast_to(D, (M, D.shape[-1]))
    U = jnp.real(loop.feedback.matrix_response()[1])
    b = jnp.real(core.input_gain.matrix_response()[1])[:, 0]
    c = jnp.real(core.output_gain.matrix_response()[1])[0, :]
    return D, U, b, c


def colorless_freq_response_fused(model):
    """``Shell.get_freq_response`` for the canonical SISO FDN shape
    through :func:`ops.pallas_solve.pallas_fdn_tf` (reference
    system.py:1081-1153 — the secondary BASELINE metric).

    The graph path drives an impulse through the module graph: per bin
    it assembles (I - diag(D) U), solves against the (M, N) rhs, applies
    both gain projections, then undoes the alias envelope with an
    irfft -> gamma^{-n} -> rfft round trip.  Here the assemble + solve +
    projections collapse into ONE Pallas grid pass over bins (the (M, N)
    rhs/solution never exist in HBM); only the alias-undo round trip
    stays in XLA, because its time-domain envelope multiply is what
    defines the reference's semantics (re-sampling the off-circle
    response back onto the unit circle, aliasing residual included).

    Returns (1, M, 1) complex, same as ``model.get_freq_response()``."""
    from flamo_tpu.ops.pallas_solve import pallas_fdn_tf
    from flamo_tpu.processor.dsp import _alias_envelope

    tf = pallas_fdn_tf(*extract_siso_tf_operands(model))
    env = _alias_envelope(model.nfft, float(model.alias_decay_db),
                          jnp.real(tf).dtype)
    h = jnp.fft.irfft(tf, n=model.nfft) * env
    return jnp.fft.rfft(h, n=model.nfft)[None, :, None]


def colorless_loss_fused_tf(model, inputs, targets,
                            sparsity_weight: float = 0.2):
    """colorless_loss through :func:`ops.pallas_solve.pallas_fdn_tf`.

    The colorless model is SISO around the loop (Gain(N,1) -> closed loop
    -> Gain(1,N)), so its whole frequency response is the scalar FDN
    transfer function tf(z) = c^T (I - diag(D) U)^{-1} diag(D) b.  The fused
    kernel assembles, solves, and applies BOTH projections in vector
    registers: per bin only D is read and one complex scalar written —
    the (M, N) loop rhs/solution of the solve-then-project path never
    exist.  Numerically the same model (gradients flow into the gain,
    delay, and mixing-matrix parameters through the kernel's VJP).

    The loss math runs on 1-D ``(M,)`` spectra when batch == 1: the
    (1, M, 1) singleton axes would otherwise force 8x-padded T(1,128)
    vector layouts on every elementwise/reduce kernel in the loss chain
    (profiled at ~9 us/step of the fused step's tail); 1-D arrays tile
    as native T(1024) lanes.  Same values either way (mse_loss sums the
    single channel then means over batch x bins)."""
    from flamo_tpu.ops.pallas_solve import pallas_fdn_tf

    tf = pallas_fdn_tf(*extract_siso_tf_operands(model))

    if (inputs.shape[0] == 1 and inputs.shape[-1] == 1
            and targets.shape[0] == 1 and targets.shape[-1] == 1):
        X = jnp.fft.rfft(inputs[0, :, 0], n=model.nfft)
        est = jnp.abs(tf * X)
        mse = jnp.mean((est - targets[0, :, 0]) ** 2)
    else:
        X = jnp.fft.rfft(inputs, n=model.nfft, axis=1)
        est = jnp.abs(tf[None, :, None] * X)
        mse = _MSE(est, targets)
    return mse + sparsity_weight * _SPARSITY(est, targets, model)


def colorless_loss_fused_step(model, inputs, targets,
                              sparsity_weight: float = 0.2,
                              pivot: bool = True):
    """colorless_loss through :func:`ops.pallas_solve.pallas_fdn_tf_mse`
    — the whole mse objective (solve, projections, |tf X|, loss AND its
    U/b/c cotangents) in ONE Pallas grid pass; only the sparsity term
    (a 6x6 matrix functional) stays in XLA.  Gradients flow into the
    gain/mixing raw parameters through the kernel's stored cotangents
    chained with the modules' maps (expm etc.) by ordinary jax.grad.

    Requires the canonical single-batch SISO workload shapes
    (inputs (1, T, 1), targets (1, M, 1)); delays may be frozen
    (cotangent skipped in-kernel) or trainable."""
    from flamo_tpu.ops.pallas_solve import pallas_fdn_tf_mse

    if (inputs.shape[0] != 1 or inputs.shape[-1] != 1
            or targets.shape[0] != 1 or targets.shape[-1] != 1):
        raise ValueError("fused_step needs batch == channels == 1, got "
                         f"inputs {inputs.shape}, targets {targets.shape}")
    D, U, b, c = extract_siso_tf_operands(model)
    X = jnp.fft.rfft(inputs[0, :, 0], n=model.nfft)
    loop = model.get_core().feedback_loop
    ff_trainable = bool(getattr(loop.feedforward, "trainable", False))
    mse = pallas_fdn_tf_mse(D, U, b, c, X, targets[0, :, 0],
                            with_dbar=ff_trainable, pivot=pivot)
    return mse + sparsity_weight * _SPARSITY(None, None, model)


def colorless_fit(model, n_steps: int, lr: float = 1e-3,
                  fused_step: bool = True, step_pivot: bool = False,
                  steps_per_call: int = 400):
    """Run the colorless objective end to end through the fused step
    kernel: build :func:`colorless_train_step`, jit a ``lax.scan`` of
    <= ``steps_per_call`` optimizer steps per dispatch, and run
    ``n_steps`` of them on the canonical impulse -> flat-magnitude pair
    (exact for the reference's ``DatasetColorless`` expand semantics,
    reference optimize/dataset.py:54-85).  Returns
    ``(trained model, per-step loss history)``.

    This is the paved-road entry the e8 colorless example uses on
    accelerators (``--fast auto``; ~19k steps/s on the tunnel via the
    no-pivot fused step kernel, BENCH.md) — same pattern as
    :func:`flamo_tpu.models.aa_evs_fit`.  Callers gate it on loss
    parity with the graph criterion and fall back to the Trainer."""
    import numpy as np

    from flamo_tpu.utils import to_device

    step, opt_state = colorless_train_step(
        model, lr=lr, fused_step=fused_step, step_pivot=step_pivot)
    M = model.nfft // 2 + 1
    inputs = jnp.zeros((1, M, 1)).at[:, 0, :].set(1.0)
    targets = jnp.ones((1, M, 1))
    m, o, x, t = to_device((model, opt_state, inputs, targets))

    def multi(m, o, x, t, k):
        def body(carry, _):
            mm, oo = carry
            mm, oo, loss = step(mm, oo, x, t)
            return (mm, oo), loss

        (m, o), losses = jax.lax.scan(body, (m, o), None, length=k)
        return m, o, losses

    jm = jax.jit(multi, static_argnums=(4,), donate_argnums=(0, 1))
    history = []
    done = 0
    while done < n_steps:
        k = min(steps_per_call, n_steps - done)
        m, o, losses = jm(m, o, x, t, k)
        history.append(np.asarray(losses))
        done += k
    return m, np.concatenate(history)


def colorless_train_step(model, lr: float = 1e-3, fused_tf: bool = False,
                         fused_step: bool = False,
                         step_pivot: bool = True):
    """Build (jittable_step, opt_state) for this workload.

    fused_tf=True swaps the forward for :func:`colorless_loss_fused_tf`
    (the register-resident transfer-function kernel); fused_step=True
    for :func:`colorless_loss_fused_step` (loss AND gradients in one
    kernel pass; step_pivot=False additionally drops the pivoting and
    reuses the forward factors for the adjoint — gate on a finite-loss
    check)."""
    tx = masked_optimizer(optax.adam(lr), model)
    opt_state = tx.init(model)
    loss_fn = colorless_loss
    if fused_step:
        import functools

        loss_fn = functools.partial(colorless_loss_fused_step,
                                    pivot=step_pivot)
    elif fused_tf:
        loss_fn = colorless_loss_fused_tf

    def step(model, opt_state, inputs, targets):
        loss, grads = jax.value_and_grad(loss_fn)(model, inputs, targets)
        updates, opt_state = tx.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    return step, opt_state
