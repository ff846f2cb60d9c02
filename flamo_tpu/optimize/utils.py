"""Optimization utilities (counterpart of reference flamo/optimize/utils.py)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from flamo_tpu.utils import next_key


def generate_partitions(tensor, n_samples: int, n_sets: int,
                        seed: Optional[int] = None, key=None):
    """``n_sets`` shuffled equal partitions of a tensor
    (reference optimize/utils.py:5-45).  Returns
    (n_sets * (len // n_samples), n_samples)."""
    if seed is not None:
        key = jax.random.PRNGKey(seed)
    tensor = jnp.asarray(tensor)
    length = tensor.shape[0]
    n_partitions = length // n_samples
    if length % n_samples != 0:
        print(
            "Warning: Tensor length is not divisible by n_samples so there "
            "will be some samples left out."
        )
    key = next_key(key)
    sets = []
    for _ in range(n_sets):
        key, sub = jax.random.split(key)
        shuffled = tensor[jax.random.permutation(sub, length)]
        parts = [shuffled[i * n_samples:(i + 1) * n_samples]
                 for i in range(n_partitions)]
        sets.append(jnp.stack(parts))
    return jnp.vstack(sets)
