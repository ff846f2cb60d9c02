"""Dataset / loader semantics (reference flamo/optimize/dataset.py)."""

import jax.numpy as jnp
import numpy as np

from flamo_tpu.optimize import (
    Dataset, DatasetColorless, get_dataloader, load_dataset, split_dataset,
)


def test_dataset_expand():
    ds = Dataset(input=jnp.ones((1, 8, 2)), target=jnp.zeros((1, 8, 2)),
                 expand=10)
    assert len(ds) == 10
    x, t = ds[3]
    assert x.shape == (8, 2) and float(x[0, 0]) == 1.0


def test_dataset_colorless_impulse_and_flat():
    ds = DatasetColorless(input_shape=(1, 65, 1), target_shape=(1, 65, 1),
                          expand=5)
    x, t = ds[0]
    assert float(x[0, 0]) == 1.0 and float(jnp.abs(x[1:]).max()) == 0.0
    assert float(t.min()) == 1.0 and float(t.max()) == 1.0


def test_split_and_loaders_static_shapes():
    ds = Dataset(input=jnp.arange(6.0).reshape(1, 3, 2),
                 target=jnp.ones((1, 3, 2)), expand=10)
    train, valid = split_dataset(ds, split=0.8, seed=0)
    assert len(train) == 8 and len(valid) == 2
    loader = get_dataloader(train, batch_size=3, shuffle=True, seed=1)
    batches = list(loader)
    # drop_last semantics: 8 // 3 = 2 full batches
    assert len(batches) == 2
    for x, t in batches:
        assert x.shape == (3, 3, 2) and t.shape == (3, 3, 2)


def test_load_dataset_roundtrip():
    ds = DatasetColorless(input_shape=(1, 33, 1), target_shape=(1, 33, 1),
                          expand=20)
    tl, vl = load_dataset(ds, batch_size=4, split=0.8, seed=0)
    xb, tb = next(iter(tl))
    assert xb.shape == (4, 33, 1)
    assert len(list(tl)) == 4 and len(list(vl)) == 1
