"""Micro-benchmark the fused attenuated-FDN kernel against its parts on
the attached TPU (diagnosis harness for the 788-vs-2249 steps/s gap).

Times, at bench shapes (M=48001, N=6, P=3, configurable K):
  - pallas_fdn_tf_mse        (colorless fused step: solve+loss+adjoint)
  - pallas_sos_cascade fwd   (cascade response alone)
  - pallas_sos_cascade vjp   (cascade fwd + tap-cotangent backward)
  - pallas_fdn_sos_tf_mse    (the combined kernel)
so the combined kernel's overhead over (cascade vjp + colorless step)
is directly visible.  K sweep shows whether the per-section loops or
the solve dominate.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e6  # us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nfft", type=int, default=96000)
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--k_sections", type=int, default=12)
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
    G = jnp.asarray((rng.normal(size=(M, N))
                     + 1j * rng.normal(size=(M, N))).astype(np.complex64))

    colorless = jax.jit(lambda D, U, b, c, X, t: ps.pallas_fdn_tf_mse(
        D, U, b, c, X, t, with_dbar=False, pivot=False))
    casc_fwd = jax.jit(lambda bt, at: ps.pallas_sos_cascade(bt, at, nfft))

    def casc_vjp(bt, at, G):
        y, pull = jax.vjp(lambda bb, aa: ps.pallas_sos_cascade(
            bb, aa, nfft), bt, at)
        return pull(G)

    casc_vjp = jax.jit(casc_vjp)
    fused = jax.jit(
        lambda D, bt, at, U, b, c, X, t: ps.pallas_fdn_sos_tf_mse(
            D, bt, at, U, b, c, X, t, nfft=nfft, with_dbar=False,
            pivot=False))
    fused_grad = jax.jit(jax.grad(
        lambda D, bt, at, U, b, c, X, t: ps.pallas_fdn_sos_tf_mse(
            D, bt, at, U, b, c, X, t, nfft=nfft, with_dbar=False,
            pivot=False), argnums=(1, 2, 3, 4, 5)))

    print(f"nfft={nfft} N={N} K={K}")
    print(f"colorless fused step : "
          f"{timeit(colorless, D, U, b, c, X, t):9.1f} us")
    print(f"sos cascade fwd      : {timeit(casc_fwd, bt, at):9.1f} us")
    print(f"sos cascade fwd+vjp  : {timeit(casc_vjp, bt, at, G):9.1f} us")
    print(f"fused sos step (val) : "
          f"{timeit(fused, D, bt, at, U, b, c, X, t):9.1f} us")
    print(f"fused sos step (grad): "
          f"{timeit(fused_grad, D, bt, at, U, b, c, X, t):9.1f} us")


if __name__ == "__main__":
    main()
