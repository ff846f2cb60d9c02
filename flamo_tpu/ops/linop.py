"""Tagged per-bin linear-operator algebra.

Every processor is, per frequency bin, a linear map on channels.  Instead
of discovering that map by feeding an (M, N, N) identity through the module
graph (the reference's approach, flamo/processor/system.py:417-425 — which
materializes M tiny matmuls per module), modules expose their map directly
in the cheapest faithful form:

  * ``('flat', (N_out, N_in))`` — frequency-flat (gains, matrices),
  * ``('diag', (M, N))``        — diagonal per bin (parallel modules),
  * ``('full', (M, N_out, N_in))`` — dense per bin (FIR/IIR matrices).

Composition keeps the cheapest representation: diag∘diag stays elementwise,
flat∘flat is one small matmul, and only genuinely dense combinations pay
for per-bin matmuls.  This shrinks both FLOPs and — more importantly on a
latency-sensitive backend — the number of launched kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FLAT, DIAG, FULL = "flat", "diag", "full"


def compose(kind_b, Hb, kind_a, Ha):
    """Operator for 'apply A first, then B':  H = H_b @ H_a per bin."""
    if kind_b == FLAT and kind_a == FLAT:
        return FLAT, Hb @ Ha
    if kind_b == DIAG and kind_a == DIAG:
        return DIAG, Hb * Ha
    if kind_b == FLAT and kind_a == DIAG:
        # columns scaled: H[f,i,j] = U[i,j] d[f,j]
        return FULL, Hb[None, :, :] * Ha[:, None, :]
    if kind_b == DIAG and kind_a == FLAT:
        # rows scaled: H[f,i,j] = d[f,i] U[i,j]
        return FULL, Ha[None, :, :] * Hb[:, :, None]
    if kind_b == FULL and kind_a == FLAT:
        return FULL, jnp.einsum("fij,jk->fik", Hb, Ha)
    if kind_b == FLAT and kind_a == FULL:
        return FULL, jnp.einsum("ij,fjk->fik", Hb, Ha)
    if kind_b == FULL and kind_a == DIAG:
        return FULL, Hb * Ha[:, None, :]
    if kind_b == DIAG and kind_a == FULL:
        return FULL, Ha * Hb[:, :, None]
    if kind_b == FULL and kind_a == FULL:
        return FULL, jnp.einsum("fij,fjk->fik", Hb, Ha)
    raise ValueError(f"unknown kinds {kind_b}, {kind_a}")


def materialize(kind, H, M: int, n_out: int, n_in: int):
    """-> dense (M, n_out, n_in)."""
    if kind == FULL:
        return jnp.broadcast_to(H, (M, n_out, n_in))
    if kind == FLAT:
        return jnp.broadcast_to(H[None, :, :], (M, n_out, n_in))
    # diag
    d = jnp.broadcast_to(H, (M, n_out))
    return d[:, :, None] * jnp.eye(n_out, dtype=H.dtype)[None]


def add(kind_a, Ha, kind_b, Hb, M, n_out, n_in):
    """Sum of two operators (used by Parallel with sum_output)."""
    if kind_a == kind_b and kind_a in (FLAT, DIAG):
        return kind_a, Ha + Hb
    return FULL, (materialize(kind_a, Ha, M, n_out, n_in)
                  + materialize(kind_b, Hb, M, n_out, n_in))


def apply(kind, H, x):
    """Apply the operator to a spectrum x (B, M, N_in, ...)."""
    if kind == FLAT:
        return jnp.einsum("mn,bfn...->bfm...", H, x)
    if kind == DIAG:
        if H.shape[0] == 1:
            return jnp.einsum("n,bfn...->bfn...", H[0], x)
        return jnp.einsum("fn,bfn...->bfn...", H, x)
    return jnp.einsum("fmn,bfn...->bfm...", H, x)
