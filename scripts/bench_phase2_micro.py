"""Micro-benchmark for the fused attenuated-FDN kernel's phase 2 (the
(K, N) SOS tap-cotangent loop): isolates which part of the 144-section
loop dominates on the TPU — the per-section elementwise math (Horner +
divide + q) or the 3 full-tile reductions per section.

Variants (same grid/tile structure as _fdn_sos_tf_mse_kernel):
  full      current structure: Horner3 + cabs2 + divide + q + 3 jnp.sum
  ps        prefix/suffix-product elementwise (1 cmul for P*S, 1 for q,
            one divide per CHANNEL) + 3 jnp.sum
  noreduce  current elementwise, reductions replaced by accumulating
            into a running tile (reduce cost isolated by subtraction)
  lanered   current elementwise + per-section lane-only reduces
            (axis=1 -> (8,1)), cross-sublane deferred to a final pass

Run:  python scripts/bench_phase2_micro.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from flamo_tpu.ops.pallas_solve import (TILE, _bin_phasor, _cabs2, _cmul,
                                        _horner3)

NFFT = 96000
P = 3
K = 12
N = 6
S = 2 * K * N  # 144 section passes (b and a taps)


def _kernel(variant: str, t_ref, c_ref, out_ref):
    shape = (TILE // 128, 128)
    z, _ = _bin_phasor(NFFT, shape)
    zs = [z]
    for _ in range(2, P):
        zs.append(_cmul(zs[-1], z))
    tn = (t_ref[0].reshape(shape), t_ref[1].reshape(shape))

    if variant == "noreduce":
        accr = jnp.zeros(shape, jnp.float32)
        acci = jnp.zeros(shape, jnp.float32)
        for s in range(S):
            sec = _horner3(c_ref, s % K, s % N, z, P, shape)
            d = _cabs2(sec)
            okd = d > 0.0
            invd = 1.0 / jnp.where(okd, d, 1.0)
            qr = jnp.where(okd, (tn[0] * sec[0] + tn[1] * sec[1]) * invd,
                           0.0)
            qi = jnp.where(okd, (tn[1] * sec[0] - tn[0] * sec[1]) * invd,
                           0.0)
            accr = accr + qr
            for zp in zs:
                acci = acci + (qr * zp[0] - qi * zp[1])
        out_ref[0] = jnp.stack([jnp.sum(accr), jnp.sum(acci),
                                jnp.float32(0.0)]).reshape(1, 3)
        return

    if variant == "lanered":
        rows = []
        for s in range(S):
            sec = _horner3(c_ref, s % K, s % N, z, P, shape)
            d = _cabs2(sec)
            okd = d > 0.0
            invd = 1.0 / jnp.where(okd, d, 1.0)
            qr = jnp.where(okd, (tn[0] * sec[0] + tn[1] * sec[1]) * invd,
                           0.0)
            qi = jnp.where(okd, (tn[1] * sec[0] - tn[0] * sec[1]) * invd,
                           0.0)
            part = jnp.sum(qr, axis=1, keepdims=True)  # (8, 1)
            for zp in zs:
                part = part + jnp.sum(qr * zp[0] - qi * zp[1], axis=1,
                                      keepdims=True)
            rows.append(part)
        big = jnp.concatenate(rows, axis=1)  # (8, S)
        out_ref[0] = jnp.sum(big) + jnp.zeros((1, 3), jnp.float32)
        return

    if variant == "ps":
        # prefix/suffix products per channel: one divide per channel,
        # per-section cost = 2 cmuls + tap projections
        rows = []
        for n in range(N):
            # cascade products (phase 1 recompute, shared)
            pres = [(jnp.ones(shape, jnp.float32),
                     jnp.zeros(shape, jnp.float32))]
            for k in range(K):
                sec = _horner3(c_ref, k, n, z, P, shape)
                pres.append(_cmul(pres[-1], sec))
            sufs = [(jnp.ones(shape, jnp.float32),
                     jnp.zeros(shape, jnp.float32))]
            for k in range(K - 1, -1, -1):
                sec = _horner3(c_ref, k, n, z, P, shape)
                sufs.append(_cmul(sufs[-1], sec))
            sufs = sufs[::-1]
            prod = pres[-1]
            d = _cabs2(prod)
            okd = d > 0.0
            invd = 1.0 / jnp.where(okd, d, 1.0)
            tpr = jnp.where(okd, (tn[0] * prod[0] + tn[1] * prod[1])
                            * invd, 0.0)
            tpi = jnp.where(okd, (tn[1] * prod[0] - tn[0] * prod[1])
                            * invd, 0.0)
            for rep in range(2):  # b-taps and a-taps passes
                for k in range(K):
                    ps_ = _cmul(pres[k], sufs[k + 1])
                    qr = tpr * ps_[0] - tpi * ps_[1]
                    qi = tpr * ps_[1] + tpi * ps_[0]
                    vals = [jnp.sum(qr)]
                    for zp in zs:
                        vals.append(jnp.sum(qr * zp[0] - qi * zp[1]))
                    rows.append(jnp.stack(vals))
        out_ref[0] = jnp.sum(jnp.stack(rows), axis=0, keepdims=True)
        return

    # 'full': the current kernel's structure
    rows = []
    for s in range(S):
        sec = _horner3(c_ref, s % K, s % N, z, P, shape)
        d = _cabs2(sec)
        okd = d > 0.0
        invd = 1.0 / jnp.where(okd, d, 1.0)
        qr = jnp.where(okd, (tn[0] * sec[0] + tn[1] * sec[1]) * invd, 0.0)
        qi = jnp.where(okd, (tn[1] * sec[0] - tn[0] * sec[1]) * invd, 0.0)
        vals = [jnp.sum(qr)]
        for zp in zs:
            vals.append(jnp.sum(qr * zp[0] - qi * zp[1]))
        rows.append(jnp.stack(vals))
    out_ref[0] = jnp.sum(jnp.stack(rows), axis=0, keepdims=True)


def run(variant: str, k: int = 50):
    Mp = ((NFFT // 2 + 1 + TILE - 1) // TILE) * TILE
    grid = Mp // TILE
    t = jnp.ones((2, Mp), jnp.float32)
    c = jnp.asarray(np.random.default_rng(0)
                    .uniform(0.5, 1.5, (P, K, N)).astype(np.float32))
    out_shape = {"full": (grid, 1, 3), "ps": (grid, 1, 3),
                 "noreduce": (grid, 1, 3), "lanered": (grid, 1, 3)}[variant]

    fn = pl.pallas_call(
        functools.partial(_kernel, variant),
        grid=(grid,),
        in_specs=[pl.BlockSpec((2, TILE), lambda i: (0, i)),
                  pl.BlockSpec((P, K, N), lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, 3), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
    )
    jf = jax.jit(lambda t, c: jnp.sum(fn(t, c)))
    v = jf(t, c)
    float(v)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(k):
            v = jf(t, c)
        float(v)
        best = min(best, (time.perf_counter() - t0) / k)
    print(f"{variant:9s}: {best * 1e6:8.1f} us/call")


if __name__ == "__main__":
    for variant in sys.argv[1:] or ["full", "noreduce", "lanered", "ps"]:
        run(variant)
