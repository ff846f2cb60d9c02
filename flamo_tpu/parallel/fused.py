"""Fused Pallas step kernels under multi-device sharding.

The single-chip speed records live in the fused Mosaic step kernels
(ops.pallas_solve); the multi-chip scaling axis is the frequency-bin
shard (parallel.mesh).  This module composes the two: the colorless-FDN
fused step kernel (``pallas_fdn_tf_mse`` — solve + loss + adjoint in one
grid pass) runs PER SHARD inside a ``shard_map`` over a 1-D 'bins' mesh.

How the kernel's grid interacts with GSPMD sharding: ``shard_map``
splits the padded bin axis into equal per-device blocks BEFORE the
kernel is traced, so each device lowers its own ``pallas_call`` whose
grid covers only the local ``M/n`` bins — the kernel itself is
sharding-oblivious (its operands carry no global bin indices; the delay
responses ``D``, input spectrum ``X`` and target ``t`` arrive already
sliced).  Zero-padded bins are exact no-ops (``D = 0`` rows make the
loop matrix the identity and ``t = 0`` matches the resulting zero
magnitude), so the global loss is the psum of per-shard partial sums.
The only collectives are that scalar psum and the gradient psums that
``shard_map`` transposition inserts for the replicated parameter
operands ``U``/``b``/``c`` — both ride ICI.

Caveat for kernels that derive bin indices from ``pl.program_id`` (the
SOS-cascade family computes its phasor from iota): those are NOT
shard-oblivious — sharding them needs a per-shard bin offset operand.
``pallas_fdn_tf_mse`` takes explicit per-bin operands, so it composes
as-is; tests/test_parallel.py lockstep-asserts it against the unsharded
kernel on the 8-virtual-device CPU mesh (interpret mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from flamo_tpu.core import masked_optimizer
from flamo_tpu.parallel.dp import shard_map

__all__ = ["bins_sharded_fused_loss", "make_bins_sharded_fused_step"]


def bins_sharded_fused_loss(model, X, t, mesh, axis_name: str = "bins",
                            pivot: bool = True,
                            sparsity_weight: float = 0.2):
    """Colorless fused-step loss (mse through ``pallas_fdn_tf_mse`` +
    sparsity) with the bin axis sharded over ``mesh[axis_name]``.

    ``X``/``t`` are the (M,) input spectrum and target magnitude; the
    bin axis is zero-padded up to a multiple of the mesh size and each
    shard runs the fused kernel on its local block.  Numerically
    lockstep with :func:`models.colorless_fdn.colorless_loss_fused_step`
    up to f32 reduction order.  Differentiable in the model (delays
    frozen, as in the colorless workload)."""
    from flamo_tpu.models.colorless_fdn import (_SPARSITY,
                                                extract_siso_tf_operands)
    from flamo_tpu.ops.pallas_solve import pallas_fdn_tf_mse

    n = mesh.shape[axis_name]
    D, U, b, c = extract_siso_tf_operands(model)
    M = D.shape[0]
    Mp = ((M + n - 1) // n) * n
    pad = Mp - M
    if pad:
        D = jnp.pad(D, ((0, pad), (0, 0)))
        X = jnp.pad(X, (0, pad))
        t = jnp.pad(t, (0, pad))

    def shard_fn(D, X, t, U, b, c):
        # kernel divides its partial sum by the LOCAL bin count; undo,
        # psum, renormalize by the true global M
        part = pallas_fdn_tf_mse(D, U, b, c, X, t, with_dbar=False,
                                 pivot=pivot)
        return jax.lax.psum(part * D.shape[0], axis_name) / M

    loss = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name), P(axis_name),
                  P(), P(), P()),
        out_specs=P(), check_vma=False,
    )(D, X, t, U, b, c)
    return loss + sparsity_weight * _SPARSITY(None, None, model)


def make_bins_sharded_fused_step(model, mesh, lr: float = 1e-3,
                                 axis_name: str = "bins",
                                 pivot: bool = True,
                                 sparsity_weight: float = 0.2):
    """Build ``(jittable_step, opt_state)`` for the colorless workload
    where the fused Pallas step kernel runs bins-sharded over ``mesh``
    (parameters and optimizer state replicated; gradient psums are the
    only parameter collectives).  step(model, opt_state, inputs,
    targets) takes the canonical (1, T, 1) impulse / (1, M, 1) target
    shapes of the workload."""
    tx = masked_optimizer(optax.adam(lr), model)
    opt_state = tx.init(model)
    nfft = model.nfft

    def step(model, opt_state, inputs, targets):
        X = jnp.fft.rfft(inputs[0, :, 0], n=nfft)

        def loss_fn(m):
            return bins_sharded_fused_loss(
                m, X, targets[0, :, 0], mesh, axis_name=axis_name,
                pivot=pivot, sparsity_weight=sparsity_weight)

        loss, grads = jax.value_and_grad(loss_fn)(model)
        updates, opt_state = tx.update(grads, opt_state, model)
        return optax.apply_updates(model, updates), opt_state, loss

    return step, opt_state
