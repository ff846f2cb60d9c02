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
* ``masked_mse_loss`` [+ ``sparsity_loss``] on a SISO Shell whose loop
  is diagonal delays x full frequency-dependent feedback (the
  scattering-FDN topology) -> the masked-bin fast path
  (``models.sfdn_masked_est``: the objective reads only each step's
  ``n_samples`` masked bins, so the closed loop is solved there alone
  — 24x fewer solves at the reference scenario, pivoted ``ge_cached``
  solve, pure XLA so it dispatches on CPU too).

The two dispatched Pallas kernels run ``pivot=False`` (the masked sfdn
path keeps the pivoted ``ge_cached`` solve — its paraunitary loop is
frequency-dependent, so the flat-loop norm argument below does not
apply).  For the recognized kernel topologies no-pivot is safe by
construction, not by luck: the loop matrix is
``A = diag(D) U`` (colorless: unit-modulus delays x orthogonal mixing)
or ``diag(D) diag(g) U`` with per-band attenuations ``|g| <= 1``
(stability-by-construction gamma maps), so ``||A||_2 <= 1`` and every
leading principal submatrix of ``I - A`` is ``I_k - A[:k,:k]`` with
``||A[:k,:k]||_2 <= ||A||_2 <= 1`` — the no-pivot elimination can only
meet a (near-)zero pivot where the PIVOTED solve is (near-)singular too
(an exact closed-loop resonance), and training preserves the structure
(expm of skew stays orthogonal, gamma maps stay bounded).  As a
backstop the Trainer still watchdogs the fused path: a non-finite loss
at any host sync point raises with instructions to retrain with
``fused='off'`` instead of silently carrying NaNs
(``Trainer._check_fused_finite``).

The active-acoustics eigenvalue objective (``mse_evs``) needs the
:class:`models.ActiveAcoustics` wrapper's frozen-row extraction and has
its own paved road (``models.aa_evs_fit``, used by the e8 example's
``--fast auto``); it is not dispatched from Trainer.
"""

from __future__ import annotations

import jax.numpy as jnp


def recognize_fused(model, criterion, alpha, requires_model):
    """Return a list of ``(name, loss_fn, cpu_ok)`` fused-objective
    candidates for the Trainer's registered criteria, best first; empty
    if nothing matches.  ``cpu_ok`` marks pure-XLA candidates that are
    worth dispatching on the CPU backend too (the Pallas kernels run
    interpreter-mode there and lose to the graph path).

    ``loss_fn(model, inputs, targets, step, loss_state) -> (total, per)``
    mirrors ``Trainer._total_loss`` (``per`` in criterion order), so the
    Trainer can swap it in without touching its logging/early-stop
    machinery."""
    from flamo_tpu.optimize.loss import (masked_mse_loss, mse_loss,
                                         sparsity_loss)

    kinds = []
    for c, rm in zip(criterion, requires_model):
        if isinstance(c, mse_loss) and not rm:
            kinds.append("mse")
        elif isinstance(c, masked_mse_loss) and not rm:
            kinds.append("masked_mse")
        elif isinstance(c, sparsity_loss) and rm:
            kinds.append("sparsity")
        else:
            # unknown criterion, or a known one registered with an
            # unexpected requires_model flag (the fused objectives bake
            # in mse(est, target) / sparsity(model) call shapes)
            kinds.append(None)
    n_fit = kinds.count("mse") + kinds.count("masked_mse")
    if n_fit != 1 or None in kinds or kinds.count("sparsity") > 1:
        return []
    masked = "masked_mse" in kinds
    i_mse = kinds.index("masked_mse" if masked else "mse")
    a_mse = alpha[i_mse]
    i_sp = kinds.index("sparsity") if "sparsity" in kinds else None
    a_sp = alpha[i_sp] if i_sp is not None else 0.0
    sp_crit = criterion[i_sp] if i_sp is not None else None
    n = len(kinds)

    if masked:
        # -- scattering-FDN combo: masked_mse [+ sparsity] on a SISO
        # Shell whose loop is diagonal delays x full frequency-dependent
        # feedback -> the masked-bin fast path (models.sfdn_masked_est:
        # the objective reads only the step's n_samples masked bins, so
        # the closed loop is assembled + solved there alone — 24x fewer
        # solves at the reference scenario; pivoted ge_cached solve).
        mm_crit = criterion[i_mse]
        # loss_state index of the masked_mse criterion among the
        # stateful criteria (Trainer._gather_loss_state order)
        si_mm = sum(1 for c in criterion[:i_mse]
                    if getattr(c, "stateful", False))
        try:
            from flamo_tpu.models.scattering_fdn import sfdn_masked_est

            core = model.get_core()
            loop = core.feedback_loop
            M = model.nfft // 2 + 1
            if loop.feedforward.response().shape != (
                    M, loop.output_channels):
                return []
            if loop.feedback.response().shape != (
                    M, loop.output_channels, loop.output_channels):
                return []
            core.input_gain.response()
            core.output_gain.response()
        except Exception:
            return []

        def sfdn_loss_fn(model, inputs, targets, step, loss_state):
            if inputs.shape[0] != 1 or inputs.shape[-1] != 1 \
                    or targets.shape[-1] != 1:
                raise ValueError("masked sfdn path needs batch == "
                                 "channels == 1")
            # mask selection mirrors masked_mse_loss.__call__ exactly
            # (loss.py:268-278) so the schedule is the graph path's
            if mm_crit.regenerate_mask:
                mask = mm_crit.masks_for_cycle(
                    step // mm_crit.n_masks)[step % mm_crit.n_masks]
            else:
                masks = (mm_crit.mask_indices if loss_state is None
                         else loss_state[si_mm])
                mask = masks[step % masks.shape[0]]
            X = model.input_layer(inputs)
            est = sfdn_masked_est(model, X, mask)
            mse = jnp.mean((est - targets[:, mask, 0]) ** 2)
            per = [jnp.float32(0.0)] * n
            per[i_mse] = mse
            total = a_mse * mse
            if i_sp is not None:
                sp = sp_crit(None, None, model)
                per[i_sp] = sp
                total = total + a_sp * sp
            return total, per

        return [("sfdn_masked_step", sfdn_loss_fn, True)]

    def make_loss(extract, kernel_mse):
        """Shared fused-objective skeleton: ``extract(model)`` pulls the
        kernel operands (raising on topology mismatch happens at
        recognition time below), ``kernel_mse(operands, X, target,
        ff_tr)`` runs the fused Pallas step kernel for the mse term."""

        def loss_fn(model, inputs, targets, step, loss_state):
            if (inputs.shape[0] != 1 or inputs.shape[-1] != 1
                    or targets.shape[0] != 1 or targets.shape[-1] != 1):
                raise ValueError("fused step needs batch == channels == 1")
            operands = extract(model)
            X = jnp.fft.rfft(inputs[0, :, 0], n=model.nfft)
            loop = model.get_core().feedback_loop
            ff_tr = bool(getattr(loop.feedforward, "trainable", False))
            mse = kernel_mse(operands, X, targets[0, :, 0], ff_tr, model)
            per = [jnp.float32(0.0)] * n
            per[i_mse] = mse
            total = a_mse * mse
            if i_sp is not None:
                sp = sp_crit(None, None, model)
                per[i_sp] = sp
                total = total + a_sp * sp
            return total, per

        return loss_fn

    candidates = []

    # -- colorless combo: SISO diag x flat loop --------------------------
    try:
        from flamo_tpu.models.colorless_fdn import extract_siso_tf_operands

        extract_siso_tf_operands(model)  # raises if topology mismatched
    except Exception:
        pass
    else:
        from flamo_tpu.ops.pallas_solve import pallas_fdn_tf_mse

        def colorless_mse(operands, X, target, ff_tr, model):
            D, U, b, c = operands
            return pallas_fdn_tf_mse(D, U, b, c, X, target,
                                     with_dbar=ff_tr, pivot=False)

        candidates.append((
            "colorless_fused_step",
            make_loss(extract_siso_tf_operands, colorless_mse), False))

    # -- attenuated combo: loop feedback = Series(mixing, SOS cascade) ---
    try:
        from flamo_tpu.models.attenuated_fdn import (
            extract_attenuated_operands)

        extract_attenuated_operands(model)
    except Exception:
        pass
    else:
        from flamo_tpu.ops.pallas_solve import pallas_fdn_sos_tf_mse

        def attenuated_mse(operands, X, target, ff_tr, model):
            D, bt, at, U, b, c = operands
            return pallas_fdn_sos_tf_mse(D, bt, at, U, b, c, X, target,
                                         nfft=model.nfft,
                                         with_dbar=ff_tr, pivot=False)

        candidates.append((
            "attenuated_fused_step",
            make_loss(extract_attenuated_operands, attenuated_mse), False))

    return candidates
