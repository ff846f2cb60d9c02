"""Minimal repro: the fused attenuated-FDN kernel alone inside a
lax.scan (constant captured operands, no model / no optimizer / no
design glue).  Compares against the same kernel called K times via
async dispatch — isolates any scan-context slowdown of the Mosaic
custom call from everything else in the training step.

Run:  python scripts/bench_fused_sos_scan_min.py --k 100
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nfft", type=int, default=96000)
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--k_sections", type=int, default=12)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--pivot", action="store_true")
    args = ap.parse_args()
    from flamo_tpu.ops import pallas_solve as ps

    nfft, N, K, P = args.nfft, args.n, args.k_sections, 3
    M = nfft // 2 + 1
    rng = np.random.default_rng(0)
    D = jnp.asarray((0.999 * np.exp(
        1j * rng.uniform(0, 2 * np.pi, (M, N)))).astype(np.complex64))
    r = rng.uniform(0.2, 0.8, (K, N))
    th = rng.uniform(0, np.pi, (K, N))
    at = jnp.asarray(np.stack([np.ones((K, N)), -2 * r * np.cos(th),
                               r * r]).astype(np.float32))
    bt = jnp.asarray(rng.normal(size=(P, K, N)).astype(np.float32) * 0.1
                     + at)
    U = jnp.asarray(np.linalg.qr(rng.normal(size=(N, N)))[0]
                    .astype(np.float32))
    b = jnp.asarray(rng.normal(size=N).astype(np.float32))
    c = jnp.asarray(rng.normal(size=N).astype(np.float32))
    X = jnp.ones((M,), jnp.complex64)
    t = jnp.ones((M,), jnp.float32)

    # complex64 jit ARGUMENTS feeding a lax.scan body hit the tunnel's
    # complex-through-scan UNIMPLEMENTED bug (CLAUDE.md); ship re/im and
    # recombine in-program, as the model path's CachedResponse does.
    def scan_fn(Dre, Dim, Xre, Xim, t, bt, at, U, b, c):
        D = jax.lax.complex(Dre, Dim)
        X = jax.lax.complex(Xre, Xim)
        lg = jax.grad(
            lambda bt, at, U, b, c: ps.pallas_fdn_sos_tf_mse(
                D, bt, at, U, b, c, X, t, nfft=nfft, with_dbar=False,
                pivot=args.pivot), argnums=(0, 1, 2, 3, 4))

        def body(carry, _):
            g = lg(*carry)
            # SGD-flavoured update keeps the carry live (no DCE/hoist)
            new = tuple(x - 1e-6 * gx for x, gx in zip(carry, g))
            return new, g[2][0, 0]

        carry, ls = jax.lax.scan(body, (bt, at, U, b, c), None,
                                 length=args.k)
        return carry, ls[-1]

    # D/X/t as explicit jit args, not captured device constants:
    # constant capture makes lowering materialize them host-side, which
    # trips the tunnel's flaky device->host transfer phase (CLAUDE.md)
    jscan = jax.jit(scan_fn)

    out = jscan(D.real, D.imag, X.real, X.imag, t, bt, at, U, b, c)
    float(out[1])  # sync via a real device->host read
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jscan(D.real, D.imag, X.real, X.imag, t, bt, at, U, b, c)
        float(out[1])
        best = min(best, (time.perf_counter() - t0) / args.k)
    print(f"scan     : {best * 1e6:9.1f} us/step "
          f"({1.0 / best:9.1f} steps/s)")

    # async-dispatch comparison: K independent calls, one barrier
    def grad_fn(D, X, t, bt, at, U, b, c):
        return jax.grad(
            lambda bt, at, U, b, c: ps.pallas_fdn_sos_tf_mse(
                D, bt, at, U, b, c, X, t, nfft=nfft, with_dbar=False,
                pivot=args.pivot), argnums=(0, 1, 2, 3, 4))(bt, at, U, b, c)

    jg = jax.jit(grad_fn)
    out = jg(D, X, t, bt, at, U, b, c)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.k):
            out = jg(D, X, t, bt, at, U, b, c)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / args.k)
    print(f"dispatch : {best * 1e6:9.1f} us/call")


if __name__ == "__main__":
    main()
