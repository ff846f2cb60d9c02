"""Pallas TPU kernel for batched Durand-Kerner polynomial root finding.

The on-device eigensolver (:func:`flamo_tpu.functional.eigvals_dk` =
Faddeev-LeVerrier char-poly + Durand-Kerner roots) is what makes
eigenvalue objectives (optimize.mse_evs, reference
e8_active_acoustics.py:564-621) trainable on the axon TPU, where host
callbacks (LAPACK eig) are rejected outright.  Its hot part is the root
iteration: the XLA path runs ``iters`` (default 96) steps of a lax.scan
whose per-iteration work is a handful of tiny elementwise kernels over
(bins, N) arrays — at the 1601-bin partition of the active-acoustics
workload that is hundreds of ~1-2 us launch-bound kernels per training
step.  This kernel runs the ENTIRE iteration in vector registers: the
coefficient rows are read once, ``iters`` Jacobi updates of all N root
slots happen in-register (fori_loop, so code size stays bounded), and
the converged roots are written once.

Iteration semantics are IDENTICAL to ``functional._dk_iterate`` (same
init circle, same simultaneous Jacobi update, same zero-denominator
freeze guard), so the two paths agree to float rounding and the
custom-VJP pullback in :func:`flamo_tpu.functional.poly_roots` applies
unchanged.

Layout: polynomials on the bin axis (padded to TILE), coefficient /
root slots unrolled — each scalar of the iteration is an (8, 128)
register tile of independent polynomials, the same recipe as the
closed-loop solve kernels (pallas_solve.py).  Complex arithmetic is
explicit re/im pairs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flamo_tpu.ops.pallas_solve import TILE, _cmul, _csub, _interpret

__all__ = ["pallas_dk_roots", "pallas_dk_roots_rows"]


def _dk_kernel(N: int, iters: int, cr_ref, ci_ref, zr_ref, zi_ref):
    """One polynomial-tile: c* (N, TILE) monic coefficient rows
    (c[0] z^{N-1} ... c[N-1]) -> z* (N, TILE) root slots."""
    shape = (TILE // 128, 128)
    c = [(cr_ref[k].reshape(shape), ci_ref[k].reshape(shape))
         for k in range(N)]

    # Cauchy-ish radius 1 + max_k |c_k|, initial slots on a circle with
    # an irrational angle offset (functional._dk_iterate:266-271)
    R = jnp.zeros(shape, jnp.float32)
    for k in range(N):
        R = jnp.maximum(R, jnp.sqrt(c[k][0] * c[k][0] + c[k][1] * c[k][1]))
    R = 0.9 * (1.0 + R)
    zr0 = []
    zi0 = []
    for n in range(N):
        ang = 2.0 * np.pi * (n + 0.354) / N
        zr0.append(R * np.float32(np.cos(ang)))
        zi0.append(R * np.float32(np.sin(ang)))

    def body(_, carry):
        zr, zi = carry
        z = [(zr[n], zi[n]) for n in range(N)]
        znr = []
        zni = []
        for n in range(N):
            # monic Horner p(z_n)
            acc = (jnp.ones(shape, jnp.float32), jnp.zeros(shape,
                                                           jnp.float32))
            for k in range(N):
                acc = _cmul(acc, z[n])
                acc = (acc[0] + c[k][0], acc[1] + c[k][1])
            # prod_{j != n} (z_n - z_j)
            den = (jnp.ones(shape, jnp.float32), jnp.zeros(shape,
                                                           jnp.float32))
            for j in range(N):
                if j != n:
                    den = _cmul(den, _csub(z[n], z[j]))
            d2 = den[0] * den[0] + den[1] * den[1]
            ok = d2 > 0.0
            inv = 1.0 / jnp.where(ok, d2, 1.0)
            sr = (acc[0] * den[0] + acc[1] * den[1]) * inv
            si = (acc[1] * den[0] - acc[0] * den[1]) * inv
            znr.append(z[n][0] - jnp.where(ok, sr, 0.0))
            zni.append(z[n][1] - jnp.where(ok, si, 0.0))
        return tuple(znr), tuple(zni)

    zr, zi = jax.lax.fori_loop(0, iters, body,
                               (tuple(zr0), tuple(zi0)))
    for n in range(N):
        zr_ref[n] = zr[n].reshape(-1)
        zi_ref[n] = zi[n].reshape(-1)


def pallas_dk_roots_rows(cr, ci, iters: int = 96):
    """Lanes-major variant: ``cr``/``ci`` real ``(N, B)`` coefficient
    ROWS (polynomials on the last axis — the TPU lane axis) -> root
    rows ``(zr, zi)`` each ``(N, B)``.  This is the layout the
    eigenvalue training step keeps everything in (bins on lanes), so no
    transposes or complex re-assembly sit between the kernel and its
    neighbours."""
    cr = jnp.asarray(cr, jnp.float32)
    ci = jnp.asarray(ci, jnp.float32)
    N, B = cr.shape
    Bp = ((B + TILE - 1) // TILE) * TILE
    if Bp != B:
        # zero pad: p(z) = z^N, roots iterate toward 0 harmlessly
        pad = jnp.zeros((N, Bp - B), dtype=jnp.float32)
        cr = jnp.concatenate([cr, pad], axis=1)
        ci = jnp.concatenate([ci, pad], axis=1)
    spec = pl.BlockSpec((N, TILE), lambda m: (0, m),
                        memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((N, Bp), jnp.float32)] * 2
    zr, zi = pl.pallas_call(
        partial(_dk_kernel, N, iters),
        grid=(Bp // TILE,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=out_shape,
        interpret=_interpret(),
    )(cr, ci)
    return zr[:, :B], zi[:, :B]


def pallas_dk_roots(c, iters: int = 96):
    """All complex roots of monic polynomial(s) ``z^N + c[..., 0]
    z^{N-1} + ... + c[..., N-1]`` by the in-register Durand-Kerner
    kernel.  Drop-in replacement for the forward of
    :func:`flamo_tpu.functional.poly_roots` (same iteration, same root
    ordering); N static and small (<= 8), batch dims folded onto the
    kernel grid."""
    c = jnp.asarray(c)
    batch = c.shape[:-1]
    N = c.shape[-1]
    c2 = c.reshape(-1, N).T  # (N, B)
    zr, zi = pallas_dk_roots_rows(jnp.real(c2), jnp.imag(c2), iters)
    z = jax.lax.complex(zr, zi).T.reshape(batch + (N,))
    return z.astype(c.dtype)
