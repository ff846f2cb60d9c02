"""Trainer-level fused-kernel dispatch (VERDICT r4 next #4).

A user who builds the flagship FDN topology with :class:`auxiliary.reverb.
HomogeneousFDN` (or by hand) and trains it with :class:`optimize.Trainer`
should reach the same fused Pallas step kernels as the
``models.colorless_fit`` paved road — without knowing those entry points
exist.  This module is the recognition half: map (model topology,
registered criteria) onto one of the fused step objectives.  The Trainer
performs the other half (a one-time numeric parity gate on the first
batch, with silent fallback to the module-graph path — see
``Trainer._maybe_gate_fused``), so recognition only has to be
*plausible*, never *proven*: any semantic mismatch (custom output
transform, wrong shapes, retuned loss) fails the gate and the graph path
runs instead.

Recognized combinations (criterion order does not matter):

* ``mse_loss`` [+ ``sparsity_loss``] on a SISO FDN Shell whose loop is
  diagonal delays x flat mixing matrix -> the fused colorless step
  kernel (``ops.pallas_solve.pallas_fdn_tf_mse``, ~19k steps/s on the
  tunnel vs ~3.4k for the XLA graph path — BENCH.md).
* ``mse_loss`` on the attenuated-FDN topology (loop feedback =
  Series(mixing matrix, parallel SOS attenuation)) -> the fused
  attenuated step kernel (``pallas_fdn_sos_tf_mse``).

The active-acoustics eigenvalue objective (``mse_evs``) needs the
:class:`models.ActiveAcoustics` wrapper's frozen-row extraction and has
its own paved road (``models.aa_evs_fit``, used by the e8 example's
``--fast auto``); it is not dispatched from Trainer.
"""

from __future__ import annotations

import jax.numpy as jnp


def recognize_fused(model, criterion, alpha, requires_model):
    """Return a list of ``(name, loss_fn)`` fused-objective candidates
    for the Trainer's registered criteria, best first; empty if nothing
    matches.

    ``loss_fn(model, inputs, targets, step, loss_state) -> (total, per)``
    mirrors ``Trainer._total_loss`` (``per`` in criterion order), so the
    Trainer can swap it in without touching its logging/early-stop
    machinery."""
    from flamo_tpu.optimize.loss import mse_loss, sparsity_loss

    kinds = []
    for c in criterion:
        if isinstance(c, mse_loss):
            kinds.append("mse")
        elif isinstance(c, sparsity_loss):
            kinds.append("sparsity")
        else:
            kinds.append(None)
    if "mse" not in kinds or None in kinds or kinds.count("mse") > 1 \
            or kinds.count("sparsity") > 1:
        return []
    i_mse = kinds.index("mse")
    a_mse = alpha[i_mse]
    i_sp = kinds.index("sparsity") if "sparsity" in kinds else None
    a_sp = alpha[i_sp] if i_sp is not None else 0.0
    sp_crit = criterion[i_sp] if i_sp is not None else None
    n = len(kinds)

    candidates = []

    # -- colorless combo: SISO diag x flat loop --------------------------
    try:
        from flamo_tpu.models.colorless_fdn import extract_siso_tf_operands

        extract_siso_tf_operands(model)  # raises if topology mismatched
    except Exception:
        pass
    else:
        from flamo_tpu.ops.pallas_solve import pallas_fdn_tf_mse

        def colorless_loss(model, inputs, targets, step, loss_state):
            if (inputs.shape[0] != 1 or inputs.shape[-1] != 1
                    or targets.shape[0] != 1 or targets.shape[-1] != 1):
                raise ValueError("fused step needs batch == channels == 1")
            D, U, b, c = extract_siso_tf_operands(model)
            X = jnp.fft.rfft(inputs[0, :, 0], n=model.nfft)
            loop = model.get_core().feedback_loop
            ff_tr = bool(getattr(loop.feedforward, "trainable", False))
            mse = pallas_fdn_tf_mse(D, U, b, c, X, targets[0, :, 0],
                                    with_dbar=ff_tr, pivot=False)
            per = [jnp.float32(0.0)] * n
            per[i_mse] = mse
            total = a_mse * mse
            if i_sp is not None:
                sp = sp_crit(None, None, model)
                per[i_sp] = sp
                total = total + a_sp * sp
            return total, per

        candidates.append(("colorless_fused_step", colorless_loss))

    # -- attenuated combo: loop feedback = Series(mixing, SOS cascade) ---
    try:
        from flamo_tpu.models.attenuated_fdn import (
            extract_attenuated_operands)

        extract_attenuated_operands(model)
    except Exception:
        pass
    else:
        from flamo_tpu.ops.pallas_solve import pallas_fdn_sos_tf_mse

        def attenuated_loss(model, inputs, targets, step, loss_state):
            if (inputs.shape[0] != 1 or inputs.shape[-1] != 1
                    or targets.shape[0] != 1 or targets.shape[-1] != 1):
                raise ValueError("fused step needs batch == channels == 1")
            D, bt, at, U, b, c = extract_attenuated_operands(model)
            X = jnp.fft.rfft(inputs[0, :, 0], n=model.nfft)
            loop = model.get_core().feedback_loop
            ff_tr = bool(getattr(loop.feedforward, "trainable", False))
            mse = pallas_fdn_sos_tf_mse(D, bt, at, U, b, c, X,
                                        targets[0, :, 0], nfft=model.nfft,
                                        with_dbar=ff_tr, pivot=False)
            per = [jnp.float32(0.0)] * n
            per[i_mse] = mse
            total = a_mse * mse
            if i_sp is not None:
                sp = sp_crit(None, None, model)
                per[i_sp] = sp
                total = total + a_sp * sp
            return total, per

        candidates.append(("attenuated_fused_step", attenuated_loss))

    return candidates
