"""Datasets and loaders (counterpart of reference flamo/optimize/dataset.py).

The reference wraps single (input, target) tensor pairs in a
torch DataLoader; here a light numpy-side batcher yields device-ready jnp
batches.  Batches have STATIC shapes (drop_last semantics) so the jitted
train step never retraces.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np



class Dataset:
    """Single (input, target) pair expanded along dim 0 to emulate a dataset
    (reference dataset.py:9-51)."""

    def __init__(self, input=None, target=None, expand: int = 1, dtype=None):
        if input is None:
            input = np.random.randn(1, 1)
        if target is None:
            target = np.random.randn(1, 1)
        input = jnp.asarray(input)
        target = jnp.asarray(target)
        if dtype is not None and not jnp.issubdtype(input.dtype, jnp.complexfloating):
            input = input.astype(dtype)
        if dtype is not None and not jnp.issubdtype(target.dtype, jnp.complexfloating):
            target = target.astype(dtype)
        self.expand = int(expand)
        self.input = jnp.broadcast_to(input, (self.expand, *input.shape[1:]))
        self.target = jnp.broadcast_to(target, (self.expand, *target.shape[1:]))

    def __len__(self):
        return self.target.shape[0]

    def __getitem__(self, index):
        return self.input[index], self.target[index]

    def gather(self, indices):
        indices = jnp.asarray(indices)
        return self.input[indices], self.target[indices]


class DatasetColorless(Dataset):
    """Impulse input, all-ones (flat magnitude) target
    (reference dataset.py:54-85; arXiv:2402.11216)."""

    def __init__(self, input_shape: tuple, target_shape: tuple,
                 expand: int = 1000, dtype=jnp.float32):
        input = jnp.zeros(input_shape, dtype=dtype).at[:, 0, :].set(1.0)
        target = jnp.ones(target_shape, dtype=dtype)
        super().__init__(input=input, target=target, expand=expand, dtype=dtype)


class _Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = np.asarray(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, index):
        return self.dataset[self.indices[index]]

    def gather(self, indices):
        return self.dataset.gather(self.indices[np.asarray(indices)])


class DataLoader:
    """Minimal static-shape batcher (drop_last=True like the reference's
    loaders, dataset.py:91-115)."""

    def __init__(self, dataset, batch_size: int = 2000, shuffle: bool = True,
                 seed: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return max(1, len(self.dataset) // self.batch_size) \
            if len(self.dataset) >= self.batch_size else 0

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        n_batches = n // self.batch_size
        for b in range(n_batches):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            if hasattr(self.dataset, "gather"):
                yield self.dataset.gather(idx)
            else:
                xs, ys = zip(*(self.dataset[i] for i in idx))
                yield jnp.stack(xs), jnp.stack(ys)


def get_dataloader(dataset, batch_size: int = 2000, shuffle: bool = True,
                   seed: Optional[int] = None):
    """Create a loader (reference dataset.py:91-115)."""
    return DataLoader(dataset, batch_size=batch_size, shuffle=shuffle,
                      seed=seed)


def split_dataset(dataset, split: float, seed: Optional[int] = None):
    """Random train/valid split (reference dataset.py:118-143)."""
    n = len(dataset)
    train_size = int(n * split)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    return (_Subset(dataset, perm[:train_size]),
            _Subset(dataset, perm[train_size:]))


def load_dataset(dataset, batch_size: int = 2000, split: float = 0.8,
                 shuffle: bool = True, seed: Optional[int] = None):
    """Split + two loaders (reference dataset.py:146-174)."""
    train_set, valid_set = split_dataset(dataset, split, seed=seed)
    return (get_dataloader(train_set, batch_size=batch_size, shuffle=shuffle,
                           seed=seed),
            get_dataloader(valid_set, batch_size=batch_size, shuffle=shuffle,
                           seed=seed))


def stack_loader(loader):
    """Materialize a loader's batches into stacked ``(S, B, ...)`` arrays
    for :meth:`Trainer.fit_scan_epochs` (the fused-epoch TPU fast path).

    All batches have static shape by construction (the loader drops the
    ragged tail), so stacking is always well-formed.  Note the batch order
    is frozen at stacking time; restack per epoch if fresh shuffles matter.
    """
    xs, ys = zip(*iter(loader))
    return jnp.stack(xs), jnp.stack(ys)
