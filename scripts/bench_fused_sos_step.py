"""Step-level decomposition of the fused attenuated-FDN training step.

The kernel itself measures ~39 us/grad-step (scripts/bench_fused_sos.py)
yet the bench step measures 788 steps/s = ~1270 us/step — so the XLA
glue around the kernel dominates.  This times, with the SAME K-step
lax.scan harness as bench.measure_attenuated_fdn_steps_per_sec:

  real    : value_and_grad(attenuated_loss_fused_step) + masked adam
  glue    : same step but the Pallas kernel replaced by a cheap stand-in
            that consumes the same operands (extraction + maps + design
            + rfft + adam, no kernel)
  extract : forward-only operand extraction inside the scan
  graph   : the separate-kernels 'pallas' path for comparison

Run on the attached TPU:  python scripts/bench_fused_sos_step.py --k 100
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


def scan_time(jm, m, o, k, n_calls=2):
    m, o, loss = jm(m, o)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        m, o, loss = jm(m, o)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / (n_calls * k)
    return dt * 1e6, float(loss)


def harness(build_mode, loss_fn, k):
    from flamo_tpu.core import masked_optimizer
    from flamo_tpu.utils import host_eager, to_device
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    with host_eager():
        m, x, t = bench._build_attenuated(build_mode)
        tx = masked_optimizer(optax.adam(1e-4), m)
        o = tx.init(m)
    m, o, x, t = to_device((m, o, x, t))

    def step(m, o):
        loss, g = jax.value_and_grad(loss_fn)(m, x, t)
        up, o = tx.update(g, o, m)
        return optax.apply_updates(m, up), o, loss

    def multi(m, o):
        def body(c, _):
            mm, oo = c
            mm, oo, l = step(mm, oo)
            return (mm, oo), l

        (m, o), ls = jax.lax.scan(body, (m, o), None, length=k)
        return m, o, ls[-1]

    return jax.jit(multi, donate_argnums=(0, 1)), m, o


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--modes", type=str,
                    default="real,glue,extract,noext,graph")
    args = ap.parse_args()
    from flamo_tpu.models.attenuated_fdn import (
        attenuated_loss, attenuated_loss_fused_step,
        extract_attenuated_operands)
    from flamo_tpu.ops.pallas_solve import pallas_fdn_sos_tf_mse

    modes = args.modes.split(",")

    def glue_loss(model, inputs, targets):
        D, bt, at, U, b, c = extract_attenuated_operands(model)
        X = jnp.fft.rfft(inputs[0, :, 0], n=model.nfft)
        return (jnp.sum(jnp.real(D)) * 1e-12 + jnp.sum(bt) + jnp.sum(at)
                + jnp.sum(U) + jnp.sum(b) + jnp.sum(c)
                + jnp.sum(jnp.real(X)) * 1e-12
                + jnp.mean(targets) * 0.0)

    def extract_loss(model, inputs, targets):
        # no rfft, no delay response: only the trainable-chain glue
        core = model.get_core()
        att = core.feedback_loop.feedback.attenuation
        bt, at = att._design(att.map(att.param))
        U = jnp.real(core.feedback_loop.feedback.mixing_matrix
                     .matrix_response()[1])
        b = jnp.real(core.input_gain.matrix_response()[1])[:, 0]
        c = jnp.real(core.output_gain.matrix_response()[1])[0, :]
        return (jnp.sum(bt) + jnp.sum(at) + jnp.sum(U) + jnp.sum(b)
                + jnp.sum(c) + jnp.mean(targets) * 0.0
                + jnp.mean(inputs) * 0.0)

    def noext_loss(model, inputs, targets):
        # kernel with CONSTANT extracted operands: kernel + adam only
        core = model.get_core()
        att = core.feedback_loop.feedback.attenuation
        bt, at = att._design(att.map(att.param))
        M = model.nfft // 2 + 1
        N = bt.shape[-1]
        D = jnp.full((M, N), 0.999 + 0.0j, jnp.complex64)
        U = jnp.real(core.feedback_loop.feedback.mixing_matrix
                     .matrix_response()[1])
        b = jnp.real(core.input_gain.matrix_response()[1])[:, 0]
        c = jnp.real(core.output_gain.matrix_response()[1])[0, :]
        X = jnp.ones((M,), jnp.complex64)
        return pallas_fdn_sos_tf_mse(D, bt, at, U, b, c, X,
                                     targets[0, :, 0], nfft=model.nfft,
                                     with_dbar=False, pivot=False)

    table = {
        "real": ("fused_np",
                 functools.partial(attenuated_loss_fused_step, pivot=False)),
        "glue": ("fused_np", glue_loss),
        "extract": ("fused_np", extract_loss),
        "noext": ("fused_np", noext_loss),
        "graph": ("pallas", attenuated_loss),
    }
    for name in modes:
        build_mode, fn = table[name]
        jm, m, o = harness(build_mode, fn, args.k)
        us, loss = scan_time(jm, m, o, args.k)
        print(f"{name:8s}: {us:9.1f} us/step  ({1e6 / us:8.1f} steps/s)"
              f"  final={loss:.6g}", flush=True)


if __name__ == "__main__":
    main()
