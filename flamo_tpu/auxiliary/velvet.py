"""Velvet-noise filters (counterpart of reference flamo/auxiliary/velvet.py).

Velvet noise is sparse +-1/0 pseudo-random noise used in artificial
reverberation (Valimaki & Prawda 2021).  The reference regenerates a random
IR on *every* map call via torch's global RNG (velvet.py:21-114); here the
randomness is explicit: the filter holds a PRNG key leaf and
:meth:`resample` returns a module with freshly drawn impulses.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from flamo_tpu.processor.dsp import Filter, _identity
from flamo_tpu.utils import next_key


class VelvetNoiseFilter(Filter):
    """FIR filter whose taps are a velvet-noise sequence per channel pair
    (reference velvet.py:21-114).

    size: (length, N_out, N_in); density in impulses/second; delta scales the
    jitter range within each grid cell."""

    leaf_fields = ("param", "key")

    def __init__(self, size=(1, 1, 1), density: float = 1000.0,
                 delta: float = 1.0, sample_rate: int = 48000, nfft=2**11,
                 requires_grad=False, alias_decay_db=0.0, dtype=jnp.float32,
                 key=None):
        if not 0 < delta <= 1:
            raise ValueError("Delta must be in range (0, 1]")
        self.density = density
        self.sample_rate = sample_rate
        self.Td = sample_rate / density
        self.delta = delta
        self.floor_impulses = math.floor(size[0] / self.Td)
        self.key = next_key(key)
        super().__init__(size=size, nfft=nfft, map=_identity,
                         requires_grad=requires_grad,
                         alias_decay_db=alias_decay_db, dtype=dtype)

    def init_param(self, key):
        return self._generate(key)

    def _generate(self, key):
        """Draw velvet sequences for all channel pairs -> (T, N_out, N_in)."""
        T, n_out, n_in = self.size
        n_seq = n_out * n_in
        k1, k2 = jax.random.split(key)
        grid = jnp.arange(self.floor_impulses, dtype=self.dtype) * self.Td
        jitter = jax.random.uniform(
            k1, (n_seq, self.floor_impulses), dtype=self.dtype)
        idx = jnp.ceil(grid[None, :] + self.delta * jitter * (self.Td - 1))
        idx = idx.astype(jnp.int32).at[:, 0].set(0)
        idx = jnp.clip(idx, 0, T - 1)
        signs = (2 * jax.random.randint(
            k2, (n_seq, self.floor_impulses), 0, 2) - 1).astype(self.dtype)
        seq = jnp.zeros((n_seq, T), dtype=self.dtype)
        rows = jnp.broadcast_to(
            jnp.arange(n_seq)[:, None], idx.shape)
        seq = seq.at[rows, idx].set(signs)
        return seq.T.reshape(T, n_out, n_in)

    def resample(self, key=None) -> "VelvetNoiseFilter":
        """Return a copy with freshly drawn velvet impulses (the functional
        equivalent of the reference's regenerate-per-call map)."""
        key = next_key(key)
        return self.replace(param=self._generate(key), key=key)
