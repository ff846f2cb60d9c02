"""Multi-chip sharding (no counterpart in the reference — SURVEY.md §2.8
confirms the reference is strictly single-process/single-device; this module
is the TPU-native scaling design the rebuild adds).

The frequency-bin axis M = nfft//2+1 is embarrassingly parallel: every
processor is a per-bin contraction and the closed-loop solve is independent
per bin.  Sharding spectra as ``P(None, 'bins', None)`` over a 1-D mesh
therefore runs the whole forward with ZERO collectives; the only cross-chip
communication in training is the gradient all-reduce that XLA inserts
automatically because parameters are replicated.  Collectives ride ICI; DCN
is never needed at this scale.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None, axis_name: str = "bins") -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(np.array(devices[:n_devices]), axis_names=(axis_name,))


def get_mesh_2d(n_seed: int, n_bins: int,
                axis_names=("seed", "bins")) -> Mesh:
    """2-D ``n_seed x n_bins`` device mesh (multi-seed data parallelism
    over the first axis, per-member bin sharding over the second — the
    framework's 2-D scaling layout, SURVEY.md par.5)."""
    devices = jax.devices()
    need = n_seed * n_bins
    assert len(devices) >= need, (
        f"need {need} devices for a {n_seed}x{n_bins} mesh, "
        f"have {len(devices)}")
    return Mesh(np.array(devices[:need]).reshape(n_seed, n_bins),
                axis_names=tuple(axis_names))


def shard_spectrum(x, mesh: Mesh, axis_name: str = "bins"):
    """Constrain a (B, M, N, ...) spectrum to be sharded along the bin axis.

    M=48001 is not divisible by typical mesh sizes; XLA handles ragged
    shards transparently for elementwise/gather-free per-bin math."""
    spec = P(None, axis_name) + (None,) * (x.ndim - 2)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (parameters) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if isinstance(x, jax.Array)
        else x, tree)


def bin_sharded_forward(model, mesh: Mesh, axis_name: str = "bins"):
    """Wrap a model into a forward that shards the spectrum after the input
    layer.  Usage: ``fwd = bin_sharded_forward(shell, mesh); y = jit(fwd)(x)``.

    The input (time or frequency domain) enters replicated; the first
    sharding constraint after the rfft pins the bin axis to the mesh, and
    XLA propagates the sharding through every per-bin op — no collectives
    in the forward graph."""

    def forward(x, ext_param=None):
        # If a Shell: apply input layer, shard, then core+output.
        if hasattr(model, "input_layer"):
            h = model.input_layer(x)
            h = shard_spectrum(h, mesh, axis_name)
            h = model.core(h, ext_param) if ext_param is not None \
                else model.core(h)
            return model.output_layer(h)
        h = shard_spectrum(x, mesh, axis_name)
        return model(h, ext_param) if ext_param is not None else model(h)

    return forward
