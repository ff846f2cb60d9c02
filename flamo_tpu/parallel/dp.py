"""Explicit data-parallel training over a device mesh (shard_map).

No counterpart in the reference (SURVEY.md §2.8: strictly single-device) —
this is the TPU-native scaling layer for batch-parallel training: batches
shard over the mesh's ``axis_name``, parameters/optimizer state replicate,
and each step all-reduces gradients (``psum``) over ICI before the update.

For the frequency-sampling models in this package the per-example math is
identical across batch entries, so DP composes with the zero-collective
bin sharding of :mod:`flamo_tpu.parallel.mesh`: shard batch over one mesh
axis, bins over another (see ``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map  # JAX >= 0.8
    _REP_KWARG = "check_vma"
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map
    _REP_KWARG = "check_rep"


def shard_map(f, **kwargs):
    kwargs[_REP_KWARG] = kwargs.pop("check_vma", True)
    return _shard_map(f, **kwargs)


def make_dp_train_step(loss_fn, tx, mesh, axis_name: str = "batch"):
    """Build ``step(model, opt_state, inputs, targets)`` where inputs and
    targets are sharded along their leading (batch) axis over
    ``mesh[axis_name]`` and model/opt_state are replicated.

    ``loss_fn(model, inputs, targets) -> scalar`` must be a MEAN over the
    batch axis (the usual convention) so the psum-of-means over equal
    shards equals the global mean.  The returned step is already jitted
    with donated carries; the all-reduce is the only collective.
    """
    n = mesh.shape[axis_name]

    def shard_step(model, opt_state, inputs, targets):
        def local_loss(m):
            return loss_fn(m, inputs, targets)

        loss, grads = jax.value_and_grad(local_loss)(model)
        loss = jax.lax.pmean(loss, axis_name)
        grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = tx.update(grads, opt_state, model)
        import optax

        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    batch_spec = P(axis_name)
    rep = P()

    smapped = shard_map(
        shard_step, mesh=mesh,
        in_specs=(rep, rep, batch_spec, batch_spec),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(model, opt_state, inputs, targets):
        if inputs.shape[0] % n:
            raise ValueError(
                f"batch {inputs.shape[0]} not divisible by mesh axis "
                f"'{axis_name}' of size {n}")
        return smapped(model, opt_state, inputs, targets)

    return step


def shard_batch(tree, mesh, axis_name: str = "batch"):
    """Place arrays with their leading axis sharded over ``mesh[axis_name]``."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if isinstance(x, jax.Array)
        else x, tree)
