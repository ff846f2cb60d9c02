"""The scattering-FDN workload (reference examples/e8_colorless_sfdn.py
:29-152): a colorless FDN whose feedback is a learnable PARAUNITARY
ScatteringMatrix (Schlecht & Habets, 'Scattering in Feedback Delay
Networks') instead of a frequency-flat orthogonal matrix.

The reference scenario: N=6, delays [997, 1153, 1327, 1559, 1801, 2099],
nfft=96000, 30 dB alias decay, feedback = ScatteringMatrix(size=(4, N, N),
gain_per_sample=1, sparsity=3, random m_L/m_R in [1, min(delays)//2)),
trained with masked_mse_loss(n_samples=2000, n_sets=1, regenerate_mask)
+ 0.2 * sparsity_loss (reference e8_colorless_sfdn.py:110-152).

Perf profile: unlike the flagship colorless FDN (diagonal x flat loop,
fused Pallas step kernel), the scattering feedback's frequency response
is a FULL (M, N, N) complex matrix per bin, so the closed loop is a
genuine frequency-dependent batched solve — the generic solve ladder
('ge'/'ge_cached'/'ge_nopivot'/generic Pallas :func:`pallas_gauss_solve`)
is the hot path, not the fused FDN kernels."""

from __future__ import annotations

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flamo_tpu.core import masked_optimizer
from flamo_tpu.processor import dsp, system
from flamo_tpu.optimize.loss import masked_mse_loss, sparsity_loss
from flamo_tpu.utils import next_key

DEFAULT_SFDN_DELAYS = (997, 1153, 1327, 1559, 1801, 2099)


def _abs(x):
    return jnp.abs(x)


def build_colorless_sfdn(nfft: int = 96000, delays=DEFAULT_SFDN_DELAYS,
                         n_stages: int = 3, sparsity: int = 3,
                         gain_per_sample: float = 1.0,
                         alias_decay_db: float = 30.0, dtype=jnp.float32,
                         solve_method: str = "ge",
                         key=None) -> system.Shell:
    """Shell(FFT -> [Gain, Recursion(parallelDelay, ScatteringMatrix),
    Gain] -> abs) at the reference's scenario shapes
    (reference e8_colorless_sfdn.py:29-111)."""
    N = len(delays)
    key = next_key(key)
    keys = jax.random.split(key, 6)
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
    # random m_L / m_R in [1, min(delays)//2) (reference
    # e8_colorless_sfdn.py:64-80)
    m_hi = max(2, int(min(delays)) // 2)
    m_L = np.asarray(jax.random.randint(keys[3], (N,), 1, m_hi))
    m_R = np.asarray(jax.random.randint(keys[4], (N,), 1, m_hi))
    feedback = dsp.ScatteringMatrix(
        size=(n_stages + 1, N, N), nfft=nfft, sparsity=sparsity,
        gain_per_sample=gain_per_sample, m_L=m_L, m_R=m_R,
        requires_grad=True, alias_decay_db=alias_decay_db, dtype=dtype,
        key=keys[5])
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


_SPARSITY = sparsity_loss()


def sfdn_train_step(model, lr: float = 1e-3, n_samples: int = 2000,
                    sparsity_weight: float = 0.2, key=None):
    """Build (jittable_step, opt_state) for the reference objective
    masked_mse(n_samples, n_sets=1, regenerate_mask=True)
    + 0.2 * sparsity (reference e8_colorless_sfdn.py:143-152).

    The step signature is ``step(model, opt_state, inputs, targets, i)``
    — ``i`` is the optimizer-step index that selects (and in-graph
    regenerates) the bin-partition mask, so the whole schedule scans."""
    tx = masked_optimizer(optax.adam(lr), model)
    opt_state = tx.init(model)
    ml = masked_mse_loss(nfft=model.nfft, n_samples=n_samples, n_sets=1,
                         regenerate_mask=True, key=key)

    def step(model, opt_state, inputs, targets, i):
        def loss_fn(m):
            est = m(inputs)
            return (ml(est, targets, step=i)
                    + sparsity_weight * _SPARSITY(est, targets, m))

        loss, grads = jax.value_and_grad(loss_fn)(model)
        updates, opt_state = tx.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    return step, opt_state


def sfdn_masked_loss(m, X, targets, mask, sparsity_weight: float = 0.2,
                     solve_method: str = "ge_cached"):
    """The sfdn objective evaluated ONLY at the masked bins.

    ``masked_mse`` reads exactly ``n_samples`` (2000) of the 48001 bins
    per step and ``sparsity`` reads the scattering parameters, so the
    closed loop never needs solving at the other ~46k bins.  This
    computes ``est[:, mask]`` directly: gather the per-bin diagonal
    delay response and the scattering response AT the masked bins,
    assemble the (P, N, N) loop there, and solve P instead of M bins —
    a 24x smaller solve chain with bit-identical per-bin math (the
    elimination is bin-independent, so ``est_masked == est_full[mask]``
    up to f32 determinism; pinned in tests/test_models.py).

    The per-module responses come from ``response_at(mask)`` (see
    ``processor.dsp``): the scattering response as a (P, L) x (L, N*N)
    exact-phase DFT contraction on the MXU and the delay diagonal as a
    closed-form phasor — no (M, ...) array is materialized anywhere in
    the step.  (An earlier full-``response()`` + gather form measured
    5.9 ms/step on the TPU, ~60% of it (M, 6, 6)-shaped pads/copies at
    ~30x padded-tile bandwidth waste — slower than the unmasked graph
    step it was meant to beat.)

    Args: ``X`` is the input spectrum ``input_layer(inputs)`` (B, M, C)
    — loop-invariant, hoist it out of scans; ``mask`` is the (P,) bin
    index set for this step."""
    est = sfdn_masked_est(m, X, mask, solve_method=solve_method)
    mse = jnp.mean((est - targets[:, mask, 0]) ** 2)
    return mse + sparsity_weight * _SPARSITY(None, None, m)


def sfdn_masked_est(m, X, mask, solve_method: str = "ge_cached"):
    """``abs(model(inputs))[:, mask, 0]`` computed only at the masked
    bins, for a SISO Shell whose loop is diagonal delays x full
    frequency-dependent feedback (see :func:`sfdn_masked_loss`).
    Returns (B, P)."""
    core = m.get_core()
    loop = core.feedback_loop
    # response_at: the scattering response at ONLY the masked bins via
    # a (P, L) x (L, N*N) MXU DFT contraction and the delay diagonal as
    # a closed-form phasor — never materializing (M, N, N).  The full-
    # response + gather form of this step profiled 5.9 ms/step on the
    # TPU, ~3.5 ms of it (M, 6, 6) pads/copies/broadcasts at padded-
    # tile bandwidth (docs/performance.md).
    S = loop.feedback.response_at(mask)           # (P, N, N) complex
    D = loop.feedforward.response_at(mask)        # (P, N) complex diag
    gi = core.input_gain.response()               # (N, 1) complex
    go = core.output_gain.response()              # (1, N) complex
    N = D.shape[-1]
    eye = jnp.eye(N, dtype=S.dtype)
    A = eye - D[:, :, None] * S                   # (P, N, N)
    Xm = X[:, mask, 0]                            # (B, P)
    rhs = D[None] * (gi[None, None, :, 0] * Xm[:, :, None])   # (B, P, N)
    from flamo_tpu.ops.solve import closed_loop_solve

    Ab = jnp.broadcast_to(A[None], (rhs.shape[0],) + A.shape)
    y = closed_loop_solve(Ab, rhs, method=solve_method)
    return jnp.abs(jnp.einsum("n,bpn->bp", go[0], y))         # (B, P)


def sfdn_masked_train_step(model, lr: float = 1e-3, n_samples: int = 2000,
                           sparsity_weight: float = 0.2, key=None,
                           solve_method: str = "ge_cached"):
    """Masked-bin fast path for :func:`sfdn_train_step` — identical
    objective and mask schedule (same ``masked_mse_loss`` key sequence),
    but the closed loop is assembled and solved only at the step's
    ``n_samples`` masked bins (see :func:`sfdn_masked_loss`).

    Drop-in step signature: ``step(model, opt_state, inputs, targets, i)``.
    The input spectrum is recomputed per call from ``inputs`` (XLA hoists
    it out of ``lax.scan`` bodies via loop-invariant code motion; use
    :func:`sfdn_fit` with ``masked=True`` for the pre-hoisted scan form)."""
    tx = masked_optimizer(optax.adam(lr), model)
    opt_state = tx.init(model)
    ml = masked_mse_loss(nfft=model.nfft, n_samples=n_samples, n_sets=1,
                         regenerate_mask=True, key=key)

    def step(model, opt_state, inputs, targets, i):
        mask = ml.masks_for_cycle(i // ml.n_masks)[i % ml.n_masks]
        X = model.input_layer(inputs)

        def loss_fn(m):
            return sfdn_masked_loss(m, X, targets, mask,
                                    sparsity_weight=sparsity_weight,
                                    solve_method=solve_method)

        loss, grads = jax.value_and_grad(loss_fn)(model)
        updates, opt_state = tx.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    return step, opt_state


def sfdn_fit(model, n_steps: int, lr: float = 1e-3,
             n_samples: int = 2000, steps_per_call: int = 100, key=None,
             masked: bool = False, solve_method: str = "ge_cached"):
    """Train the scattering FDN on the canonical impulse -> flat pair
    through a jitted ``lax.scan`` (the paved-road entry the e8 sfdn
    example uses on accelerators).  Returns (model, loss history).

    ``masked=True`` routes through :func:`sfdn_masked_train_step` —
    same objective and mask schedule, closed loop solved only at each
    step's masked bins (24x fewer solves at the reference scenario)."""
    from flamo_tpu.utils import to_device

    if masked:
        step, opt_state = sfdn_masked_train_step(
            model, lr=lr, n_samples=n_samples, key=key,
            solve_method=solve_method)
    else:
        step, opt_state = sfdn_train_step(model, lr=lr,
                                          n_samples=n_samples, key=key)
    M = model.nfft // 2 + 1
    inputs = jnp.zeros((1, M, 1)).at[:, 0, :].set(1.0)
    targets = jnp.ones((1, M, 1))
    m, o, x, t = to_device((model, opt_state, inputs, targets))

    def multi(m, o, x, t, i0, k):
        def body(carry, i):
            mm, oo = carry
            mm, oo, loss = step(mm, oo, x, t, i0 + i)
            return (mm, oo), loss

        (m, o), losses = jax.lax.scan(body, (m, o), jnp.arange(k))
        return m, o, losses

    jm = jax.jit(multi, static_argnums=(5,), donate_argnums=(0, 1))
    history = []
    done = 0
    while done < n_steps:
        k = min(steps_per_call, n_steps - done)
        m, o, losses = jm(m, o, x, t, jnp.asarray(done), k)
        history.append(np.asarray(losses))
        done += k
    return m, (np.concatenate(history) if history
               else np.zeros(0, dtype=np.float32))
