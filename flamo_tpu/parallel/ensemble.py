"""Vmapped multi-seed ensemble training (TPU-native upgrade, no reference
counterpart — BASELINE.json mentions 'batched multi-seed' as the intended
scaling axis).

Train S independently-seeded instances of the same model simultaneously:
parameters gain a leading seed axis via ``jax.vmap`` and the seed axis is
sharded over the device mesh — classic data-parallelism where the 'data' is
the ensemble.  Zero communication between ensemble members.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flamo_tpu.core import masked_optimizer


class MultiSeedEnsemble:
    """Run S seeds of ``model_fn(key) -> model`` in parallel.

    Example::

        ens = MultiSeedEnsemble(build_fdn, n_seeds=8, mesh=get_mesh(8, 'seed'))
        losses = ens.fit(loss_fn, inputs, targets, n_steps=100, lr=1e-3)
        best = ens.best_model()
    """

    def __init__(self, model_fn: Callable, n_seeds: int,
                 mesh: Optional[Mesh] = None, axis_name: str = "seed",
                 base_seed: int = 0):
        self.n_seeds = n_seeds
        self.mesh = mesh
        self.axis_name = axis_name
        keys = jax.random.split(jax.random.PRNGKey(base_seed), n_seeds)
        models = [model_fn(k) for k in keys]
        # stack leaves along a leading seed axis; statics shared
        self.template = models[0]
        self.stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *models)
        if mesh is not None:
            sharding = NamedSharding(mesh, P(axis_name))
            self.stacked = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding)
                if isinstance(x, jax.Array) and x.ndim >= 1 else x,
                self.stacked)
        self.losses = None
        self._run_cache = {}

    def _build_runner(self, loss_fn, n_steps, lr):
        tx = masked_optimizer(optax.adam(lr), self.template)

        def one_step(model, opt_state, inputs, targets):
            def lf(m):
                return loss_fn(m, inputs, targets)

            loss, grads = jax.value_and_grad(lf)(model)
            updates, opt_state = tx.update(grads, opt_state, model)
            model = optax.apply_updates(model, updates)
            return model, opt_state, loss

        vstep = jax.vmap(one_step, in_axes=(0, 0, None, None))

        @jax.jit
        def run(model, opt_state, inputs, targets):
            def body(carry, _):
                model, opt_state = carry
                model, opt_state, loss = vstep(model, opt_state, inputs,
                                               targets)
                return (model, opt_state), loss

            (model, opt_state), losses = jax.lax.scan(
                body, (model, opt_state), None, length=n_steps)
            return model, opt_state, losses

        return tx, run

    def fit(self, loss_fn: Callable, inputs, targets, n_steps: int = 100,
            lr: float = 1e-3):
        """loss_fn(model, inputs, targets) -> scalar; vmapped over seeds.
        The compiled runner is cached per (loss_fn, n_steps, lr)."""
        key = (loss_fn, int(n_steps), float(lr))
        if key not in self._run_cache:
            self._run_cache[key] = self._build_runner(loss_fn, n_steps, lr)
        tx, run = self._run_cache[key]
        opt_state = jax.vmap(tx.init)(self.stacked)
        self.stacked, _, losses = run(self.stacked, opt_state, inputs,
                                      targets)
        self.losses = losses  # (n_steps, n_seeds)
        return losses

    def best_model(self):
        """Model of the seed with the lowest final loss."""
        assert self.losses is not None, "call fit() first"
        best = int(jnp.argmin(self.losses[-1]))
        return jax.tree_util.tree_map(lambda x: x[best], self.stacked)

    def model_at(self, seed_idx: int):
        return jax.tree_util.tree_map(lambda x: x[seed_idx], self.stacked)
