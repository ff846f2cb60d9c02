#!/usr/bin/env python
"""Benchmark harness (driver contract): prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric (BASELINE.md): colorless-FDN train steps/sec at nfft=96000
(N=6, delays 887..2053, alias 30 dB, batch 1) — the e8_colorless_fdn
workload of the reference.  ``vs_baseline`` compares against a PyTorch-CPU
implementation of the same mathematical step (independent re-implementation,
timed on this machine; cached in bench_baseline.json).

Run `python bench.py --all` for the full metric table (also measures
frequency-response evals/sec).
"""

import argparse
import json
import os
import time

NFFT = 96000
DELAYS = (887, 911, 941, 1699, 1951, 2053)
SFDN_DELAYS = (997, 1153, 1327, 1559, 1801, 2099)
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_baseline.json")
COMPILE_CACHE = "/tmp/flamo_tpu_jax_cache"


def enable_compile_cache():
    """Persistent XLA compilation cache: makes bench re-runs (and the
    pallas-subprocess retry after a flaky-phase timeout) skip the
    multi-minute compiles."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", COMPILE_CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run uncached


def measure_jax_steps_per_sec(n_steps: int = 30):
    import jax
    import jax.numpy as jnp
    import flamo_tpu
    from flamo_tpu.models import build_colorless_fdn, colorless_train_step
    from flamo_tpu.utils import host_eager

    flamo_tpu.set_seed(130709)
    with host_eager():  # eager construction on CPU; jit runs on the TPU
        model = build_colorless_fdn(nfft=NFFT, delays=DELAYS)
        step, opt_state = colorless_train_step(model, lr=1e-3)
        M = NFFT // 2 + 1
        inputs = jnp.zeros((1, M, 1)).at[:, 0, :].set(1.0)
        targets = jnp.ones((1, M, 1))
    from flamo_tpu.utils import to_device

    model, opt_state, inputs, targets = to_device(
        (model, opt_state, inputs, targets))
    step = jax.jit(step, donate_argnums=(0, 1))

    # warmup / compile
    model, opt_state, loss = step(model, opt_state, inputs, targets)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        model, opt_state, loss = step(model, opt_state, inputs, targets)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return n_steps / dt, float(loss)


def measure_jax_scan_steps_per_sec(k: int = 400, n_calls: int = 2,
                                   solve_method: str = "ge_cached",
                                   cache_delays: bool = False):
    """Production TPU training path: K optimizer steps per dispatch via
    lax.scan (exact for the reference's Dataset.expand semantics, which
    repeat one (input, target) pair).

    Uses the no-pivot factor-cached solve (ge_cached: no pivot search,
    backward reuses the forward LU factors — ~2.2x the pivoted kernel);
    main() checks the resulting loss is finite/sane and falls back to the
    pivoted 'ge' otherwise."""
    import jax
    import jax.numpy as jnp
    import flamo_tpu
    from flamo_tpu.models import build_colorless_fdn, colorless_train_step
    from flamo_tpu.utils import host_eager

    flamo_tpu.set_seed(130709)
    fused_tf = solve_method == "pallas_tf"
    fused_step = solve_method in ("pallas_step", "pallas_step_np")
    with host_eager():
        model = build_colorless_fdn(
            nfft=NFFT, delays=DELAYS,
            solve_method="ge_cached" if (fused_tf or fused_step)
            else solve_method,
            cache_delays=cache_delays)
        step, opt_state = colorless_train_step(
            model, lr=1e-3, fused_tf=fused_tf, fused_step=fused_step,
            step_pivot=solve_method != "pallas_step_np")
        M = NFFT // 2 + 1
        inputs = jnp.zeros((1, M, 1)).at[:, 0, :].set(1.0)
        targets = jnp.ones((1, M, 1))
    from flamo_tpu.utils import to_device

    model, opt_state, inputs, targets = to_device(
        (model, opt_state, inputs, targets))

    def multi(model, opt_state, inputs, targets):
        def body(carry, _):
            m, o = carry
            m, o, loss = step(m, o, inputs, targets)
            return (m, o), loss

        (model, opt_state), losses = jax.lax.scan(
            body, (model, opt_state), None, length=k)
        return model, opt_state, losses[-1]

    jmulti = jax.jit(multi, donate_argnums=(0, 1))
    model, opt_state, loss = jmulti(model, opt_state, inputs, targets)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        model, opt_state, loss = jmulti(model, opt_state, inputs, targets)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return n_calls * k / dt, float(loss)


def measure_jax_evals_per_sec(k: int = 2000, n_calls: int = 2):
    """Secondary BASELINE metric: Shell.get_freq_response evals/sec
    (reference system.py:1081-1153).

    The old per-dispatch loop (20 sequential jit calls) measured the
    TUNNEL's dispatch latency, not the workload — BENCH recorded swings
    of 350-6168 evals/s while compute-bound metrics held steady
    (VERDICT r2 weak #4).  Now k evaluations are fused into ONE
    dispatched lax.scan (steady-state compute throughput, same shape as
    the scan train bench); a carry-dependent 1e-30 parameter
    perturbation defeats loop-invariant hoisting, so all k responses
    are really computed.  Best of ``n_calls`` timed dispatches.

    k=2000: the tunnel charges ~28 ms PER DISPATCH (measured 2026-08-19:
    a trivial-body scan reads ~140 us/iter at k=200 and the SAME
    program's true cost at k=6400 — the train bench — is ~4 us/iter of
    overhead), so short scans measure the tunnel, not the workload."""
    import jax
    import jax.numpy as jnp
    import flamo_tpu
    from flamo_tpu.models import build_colorless_fdn
    from flamo_tpu.utils import host_eager

    def build(solve_method, cache_delays=False):
        flamo_tpu.set_seed(130709)
        with host_eager():
            return build_colorless_fdn(nfft=NFFT, delays=DELAYS,
                                       cache_delays=cache_delays,
                                       solve_method=solve_method)

    from flamo_tpu.utils import to_device

    # cache_delays (the train bench's default): the frozen (M, N) delay
    # phasor is a stored leaf instead of being recomputed per eval —
    # profiled at 143 us/eval of the 327 us fused eval (trig-heavy).
    # Falls back to the uncached build if the backend rejects the
    # carried re/im leaves (CLAUDE.md tunnel flake).
    try:
        model = to_device(build("ge", cache_delays=True))
        jax.block_until_ready(
            jax.jit(lambda m: m.get_freq_response(fs=48000))(model))
    except Exception:
        model = to_device(build("ge"))
    resp_fn = lambda mdl: mdl.get_freq_response(fs=48000)  # noqa: E731
    # top rung: the fused transfer-function eval — ONE Pallas pass for
    # assemble + solve + both projections, only the alias-undo
    # irfft/env/rfft round trip left in XLA.  Parity-gated against the
    # graph path (same gate the train ladder uses); any failure falls
    # through to the in-graph rungs.
    fused_ok = False
    try:
        from flamo_tpu.models import colorless_freq_response_fused

        @jax.jit
        def _fused_err(mdl):
            Hf = colorless_freq_response_fused(mdl)
            Hg = mdl.get_freq_response(fs=48000)
            return (jnp.max(jnp.abs(Hf - Hg))
                    / jnp.maximum(jnp.max(jnp.abs(Hg)), 1e-9))
        if float(_fused_err(model)) < 1e-3:
            resp_fn = colorless_freq_response_fused
            fused_ok = True
    except Exception:
        pass
    if not fused_ok:
        # gated fallback rung: the in-graph fused Pallas solve
        # (``solve_method='pallas'`` — a plain library option, same
        # module graph).  Response-parity-checked against the pivoted
        # XLA solve; any failure falls back to the XLA model.
        try:
            pmodel = to_device(build("pallas"))

            @jax.jit
            def _resp_err(a, b):
                Ha = a.get_freq_response(fs=48000)
                Hb = b.get_freq_response(fs=48000)
                return (jnp.max(jnp.abs(Ha - Hb))
                        / jnp.maximum(jnp.max(jnp.abs(Hb)), 1e-9))
            if float(_resp_err(pmodel, model)) < 1e-3:
                model = pmodel
        except Exception:
            pass

    def _perturb(mdl, c):
        return jax.tree_util.tree_map(
            lambda x: x + (c * 1e-30).astype(x.dtype)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
            mdl)

    @jax.jit
    def eval_many(mdl):
        def body(c, _):
            H = resp_fn(_perturb(mdl, c))
            return jnp.max(jnp.abs(H)) * 1e-30, None

        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
        return s

    jax.block_until_ready(eval_many(model))
    best = float("inf")
    for _ in range(n_calls):
        t0 = time.perf_counter()
        jax.block_until_ready(eval_many(model))
        best = min(best, time.perf_counter() - t0)
    return k / best


def measure_ensemble_steps_per_sec(n_seeds: int = 8, n_steps: int = 400,
                                   solve_method: str = "ge_cached"):
    """Vmapped multi-seed training throughput on one chip (the 'batched
    multi-seed' scaling axis named in BASELINE.json).  Returns aggregate
    model-steps/sec (seeds x optimizer steps / wall time).

    The XLA kernels win here (252k vs 190k model-steps/s at S=8, n=400):
    the single-model XLA path is launch-overhead-bound, so vmap grows the
    work per kernel 8x for free, while the Pallas kernel's grid just gets
    8x more programs at its solo bandwidth.  The Pallas kernels do vmap
    cleanly (verified on-chip 2026-08-16) — pass solve_method='pallas'
    to measure them."""
    import jax
    import jax.numpy as jnp
    import flamo_tpu
    from flamo_tpu.models import build_colorless_fdn
    from flamo_tpu.models.colorless_fdn import colorless_loss
    from flamo_tpu.parallel import MultiSeedEnsemble
    from flamo_tpu.utils import host_eager

    flamo_tpu.set_seed(130709)
    with host_eager():
        ens = MultiSeedEnsemble(
            lambda k: build_colorless_fdn(nfft=NFFT, delays=DELAYS,
                                          solve_method=solve_method, key=k),
            n_seeds=n_seeds)
        M = NFFT // 2 + 1
        inputs = jnp.zeros((1, M, 1)).at[:, 0, :].set(1.0)
        targets = jnp.ones((1, M, 1))
    from flamo_tpu.utils import to_device

    ens.stacked = to_device(ens.stacked)
    inputs, targets = to_device((inputs, targets))
    # warmup/compile with the SAME scan length (avoids a retrace in timing)
    import jax

    jax.block_until_ready(
        ens.fit(colorless_loss, inputs, targets, n_steps=n_steps))
    t0 = time.perf_counter()
    # fit() returns async arrays — block, or this times dispatch only
    jax.block_until_ready(
        ens.fit(colorless_loss, inputs, targets, n_steps=n_steps))
    dt = time.perf_counter() - t0
    return n_seeds * n_steps / dt


def _build_attenuated(mode: str):
    """Shared builder for the attenuated workload: identical model for
    every mode (same seed), so forward losses are directly comparable."""
    import jax.numpy as jnp
    import flamo_tpu
    from flamo_tpu.models import build_attenuated_fdn

    flamo_tpu.set_seed(130709)
    solve = "pallas" if mode == "pallas" else "ge_cached"
    cascade = "pallas" if mode == "pallas" else "xla"
    m = build_attenuated_fdn(nfft=NFFT, delays=DELAYS, octave_interval=1,
                             solve_method=solve, cascade_backend=cascade,
                             cache_delays=True)
    M = NFFT // 2 + 1
    x = jnp.zeros((1, NFFT, 1)).at[:, 0, :].set(1.0)
    t = jnp.ones((1, M, 1))
    return m, x, t


def attenuated_forward_gate(mode: str):
    """On-chip forward-parity gate for the fused attenuated-FDN step
    kernel: the init loss through the fused path must match the XLA
    module-graph loss to f32 resolution.  Raises on mismatch so the
    --attenuated-only subprocess exits nonzero and the ladder moves on."""
    import functools
    import jax
    from flamo_tpu.models.attenuated_fdn import (attenuated_loss,
                                                 attenuated_loss_fused_step)
    from flamo_tpu.utils import host_eager, to_device

    losses = {}
    for name in ("xla", mode):
        with host_eager():
            m, x, t = _build_attenuated(name)
        m, x, t = to_device((m, x, t))
        if name == "xla":
            fn = attenuated_loss
        else:
            fn = functools.partial(attenuated_loss_fused_step,
                                   pivot=(mode == "fused"))
        losses[name] = float(jax.jit(fn)(m, x, t))
    rel = (abs(losses[mode] - losses["xla"])
           / max(1e-9, abs(losses["xla"])))
    if rel > 1e-3:
        raise RuntimeError(
            f"attenuated {mode} forward parity failed: {losses}, "
            f"rel={rel:.2e}")


def measure_attenuated_fdn_steps_per_sec(k: int = 400, n_calls: int = 2,
                                         mode: str = "pallas"):
    """Third workload: the reference e8_fdn topology — delays feedforward,
    Series(orthogonal mixing, sigmoid-mapped parallelGEQ) feedback.

    Modes: 'fused_np' / 'fused' run the single-pass attenuated step
    kernel (pallas_fdn_sos_tf_mse, no-pivot resp. pivoted) — the SOS
    attenuation is evaluated inside the solve, so only the (K, N) band
    design stays in XLA; 'pallas' is the separate-kernels path (fused
    cascade + fused solve with the (M, N) response round-tripping
    between them, 2203 steps/s on-chip 2026-08-16); 'xla' the ge_cached
    fallback.  Returns (steps/s, final loss) for the caller's gate."""
    import functools
    import jax
    import optax
    from flamo_tpu.core import masked_optimizer
    from flamo_tpu.models.attenuated_fdn import (attenuated_loss,
                                                 attenuated_loss_fused_step)
    from flamo_tpu.utils import host_eager, to_device

    with host_eager():
        m, x, t = _build_attenuated(mode)
        tx = masked_optimizer(optax.adam(1e-4), m)
        o = tx.init(m)
    m, o, x, t = to_device((m, o, x, t))
    if mode in ("fused_np", "fused"):
        loss_fn = functools.partial(attenuated_loss_fused_step,
                                    pivot=(mode == "fused"))
    else:
        loss_fn = attenuated_loss

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

    jm = jax.jit(multi, donate_argnums=(0, 1))
    m, o, loss = jm(m, o)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        m, o, loss = jm(m, o)
    fl = float(loss)
    return n_calls * k / (time.perf_counter() - t0), fl


def measure_sfdn_steps_per_sec(k: int = 200, n_calls: int = 2,
                               solve_method: str = "ge_cached"):
    """Fourth workload family: the scattering FDN (reference
    examples/e8_colorless_sfdn.py:29-152) — N=6, delays 997..2099,
    paraunitary ScatteringMatrix feedback, masked_mse(2000-bin random
    partitions, regenerated in-graph) + 0.2 * sparsity.

    Unlike the flagship colorless FDN (diag x flat loop, fused step
    kernel), the feedback response here is a FULL (M, N, N) complex
    matrix per bin, so the closed loop is a genuine frequency-dependent
    batched solve — this measures the generic solve ladder on that
    shape.  ``solve_method='masked_<m>'`` routes through
    ``models.sfdn_masked_train_step`` (same objective, loop solved only
    at each step's 2000 masked bins — 24x fewer solves; lockstep parity
    pinned in tests/test_models.py) with inner solve ``<m>``.
    Returns (steps/s, final loss) for the caller's gate."""
    import jax
    import jax.numpy as jnp
    import flamo_tpu
    from flamo_tpu.models import build_colorless_sfdn
    from flamo_tpu.models.scattering_fdn import (sfdn_masked_train_step,
                                                 sfdn_train_step)
    from flamo_tpu.utils import host_eager, to_device

    flamo_tpu.set_seed(130709)
    masked = solve_method.startswith("masked_")
    with host_eager():
        model = build_colorless_sfdn(
            nfft=NFFT, delays=SFDN_DELAYS,
            solve_method="ge" if masked else solve_method)
        if masked:
            step, opt_state = sfdn_masked_train_step(
                model, solve_method=solve_method[len("masked_"):])
        else:
            step, opt_state = sfdn_train_step(model)
        M = NFFT // 2 + 1
        inputs = jnp.zeros((1, M, 1)).at[:, 0, :].set(1.0)
        targets = jnp.ones((1, M, 1))
    m, o, x, t = to_device((model, opt_state, inputs, targets))

    def multi(m, o, i0):
        def body(carry, i):
            mm, oo = carry
            mm, oo, loss = step(mm, oo, x, t, i0 + i)
            return (mm, oo), loss

        (m, o), losses = jax.lax.scan(body, (m, o), jnp.arange(k))
        return m, o, losses

    jm = jax.jit(multi, donate_argnums=(0, 1))
    m, o, losses = jm(m, o, jnp.asarray(0))
    jax.block_until_ready(losses)
    # loss at step 20 of the warmup call: the rung-parity probe.  600
    # steps of this chaotic objective diverge to O(0.5) loss spread
    # from f32 rounding alone (measured masked 1.46 vs graph 1.86 at
    # identical masks/objective), so final losses cannot gate rungs;
    # at step 20 the trajectories are still together and a miscompiled
    # rung (the gate's actual target) shows up immediately.
    l20 = float(losses[min(19, k - 1)])
    t0 = time.perf_counter()
    for c in range(n_calls):
        m, o, losses = jm(m, o, jnp.asarray((c + 1) * k))
    fl = float(losses[-1])
    return n_calls * k / (time.perf_counter() - t0), fl, l20


def measure_torch_sfdn_baseline(n_steps: int = 3):
    """Reference side of the scattering-FDN metric: an independent
    eager-torch-CPU implementation of the identical training step
    (reference e8_colorless_sfdn.py math: 4 orthogonal stages ->
    paraunitary FIR cascade with static sparsity shifts -> rfft to the
    (M, N, N) feedback response; per-bin closed-loop solve; masked MSE
    over a random 2000-bin partition + 0.2 * sparsity; Adam).  Uses
    efficient torch ops (einsum stage products, batched solve) — no
    strawman triple conv1d loop."""
    import numpy as np
    import torch

    torch.manual_seed(130709)
    N = len(SFDN_DELAYS)
    M = NFFT // 2 + 1
    n_stages, sparsity = 3, 3
    delays = torch.tensor(SFDN_DELAYS, dtype=torch.float32)
    rng = np.random.default_rng(130709)
    # static non-overlapping shifts (reference scattering.py:225-240)
    sparsity_vect = np.ones(n_stages)
    sparsity_vect[0] = sparsity
    shifts = np.zeros((n_stages, N), dtype=np.int64)
    ps = 1.0
    for s in range(n_stages):
        shifts[s] = (np.floor(sparsity_vect[s]
                              * (np.arange(N) + rng.uniform(size=N) * 0.99))
                     * ps).astype(np.int64)
        ps = ps * N * sparsity_vect[s]
    m_hi = int(min(SFDN_DELAYS)) // 2
    m_L = rng.integers(1, m_hi, N)
    m_R = rng.integers(1, m_hi, N)

    W = torch.randn(n_stages + 1, N, N, requires_grad=True)
    input_gain = torch.randn(N, 1, requires_grad=True)
    output_gain = torch.randn(1, N, requires_grad=True)
    gamma = 10 ** (-30.0 / NFFT / 20)
    omega = 2 * torch.pi * torch.arange(M) / NFFT
    x = torch.zeros(1, M, 1)
    x[:, 0, :] = 1.0
    target = torch.ones(1, M, 1)
    opt = torch.optim.Adam([W, input_gain, output_gain], lr=1e-3)

    def shift_rows(V, sh):
        # V (N, N, t): delay row i by sh[i] samples (zero-padded)
        extra = int(max(sh))
        if extra > 0:
            V = torch.nn.functional.pad(V, (0, extra))
        return torch.stack([torch.roll(V[i], int(sh[i]), dims=-1)
                            for i in range(V.shape[0])], dim=0)

    def shift_cols(V, sh):
        extra = int(max(sh))
        if extra > 0:
            V = torch.nn.functional.pad(V, (0, extra))
        return torch.stack([torch.roll(V[:, j], int(sh[j]), dims=-1)
                            for j in range(V.shape[1])], dim=1)

    def step(i):
        opt.zero_grad()
        U = torch.matrix_exp(torch.triu(W, 1) - torch.triu(W, 1).mT)
        V = U[0][:, :, None]
        for s in range(n_stages):
            V = shift_rows(V, shifts[s])
            V = torch.einsum("ik,kjt->ijt", U[s + 1], V)
        V = shift_rows(V, m_L)
        V = shift_cols(V, m_R)
        taps = V.permute(2, 0, 1)  # (T', N, N)
        env = gamma ** torch.arange(taps.shape[0], dtype=torch.float32)
        Hfb = torch.fft.rfft(taps * env[:, None, None], n=NFFT, dim=0)
        X = torch.fft.rfft(x, n=NFFT, dim=1)
        D = (gamma ** delays)[None, :] * torch.exp(
            -1j * omega[:, None] * delays[None, :])
        I = torch.eye(N, dtype=torch.complex64).expand(M, N, N)
        A = I - D[:, :, None] * Hfb
        u_in = input_gain.to(torch.complex64) @ X.permute(1, 2, 0)
        B = D[:, :, None] * u_in
        y = torch.linalg.solve(A, B)
        out = (output_gain.to(torch.complex64) @ y).permute(2, 0, 1)
        est = torch.abs(out)
        mask = torch.from_numpy(
            rng.permutation(M)[:2000].astype(np.int64))
        mse = torch.mean((est.sum(-1)[:, mask]
                          - target.squeeze(-1)[:, mask]) ** 2)
        sp = torch.mean(
            (torch.sum(torch.abs(U), dim=(-2, -1)) - N * np.sqrt(N))
            / (N * (1 - np.sqrt(N))))
        loss = mse + 0.2 * sp
        loss.backward()
        opt.step()
        return float(loss)

    step(0)  # warmup
    t0 = time.perf_counter()
    for i in range(n_steps):
        step(i + 1)
    return n_steps / (time.perf_counter() - t0)


def _build_aa(solve_method: str = "ge_cached"):
    import jax.numpy as jnp
    import flamo_tpu
    from flamo_tpu.models import build_active_acoustics

    flamo_tpu.set_seed(130297)
    # UNCACHED room (ships only the 3 MB raw IRs — the 20 MB cached-
    # response leaf intermittently trips the axon tunnel's transfer
    # bug); the hoisted step recomputes the response in-trace, once per
    # scan call, so the hot loop never re-rffts the room.
    m = build_active_acoustics(n_mics=4, n_loudspeakers=13,
                               rir_length=15000, fir_order=100,
                               nfft=NFFT, fs=48000, t60=0.5,
                               cache_room=False, solve_method=solve_method)
    M = NFFT // 2 + 1
    x = jnp.zeros((1, NFFT, 13)).at[:, 0, :].set(1.0)
    target = jnp.ones((1, M, 4))
    return m, x, target


def measure_active_acoustics_steps_per_sec(k: int = 20, n_calls: int = 3,
                                           mode: str = "hoisted",
                                           solve_method: str = "ge_cached"):
    """Second headline workload (BASELINE.md): active acoustics, 4 mics x
    13 loudspeakers, RIR length 15000, FIR order 100, nfft=96000.

    Modes (a gated ladder like the attenuated metric; _aa_best_backend
    runs 'fused_np' then 'fused_tin' in subprocesses first):

    * 'fused_tin': models.aa_fused_taps_step — the taps-in kernel
      (DFT basis built in-register from the iota phasor; tap->response
      and cotangent->tap contractions are MXU matmuls INSIDE the
      kernel at emulated-HIGH precision: 3 bf16-split DEFAULT dots,
      since Mosaic lowers only DEFAULT/HIGHEST), no-pivot.  Deletes
      the 115 us/step of XLA basis matmuls + 30 us of pads the
      'fused_np' path paid; those matmuls are pass-bound, so the win
      comes from halving the passes: 4835-4848 vs 4472 steps/s
      same-session (2026-08-19).  At HIGHEST the in-kernel variant had
      measured SLOWER (3616 vs 4387).
    * 'fused_np' / 'fused': models.aa_fused_step — the single-pass
      Pallas step kernel (assembly + solve + loss + adjoint in one grid
      pass over channels-major rows; tap<->response via MXU matmuls
      against the DFT basis), no-pivot resp. pivoted.  RAISES on parity
      failure so the --aa-only subprocess exits nonzero.
    * 'hoisted' (in-process default): models.aa_hoisted_room_step — the
      frozen room's pad->rfft->response chain runs once per scan call
      instead of once per step (10.8 ms/step profiled on the graph
      path, 2026-08-17), forward-parity-gated with in-process fallback
      to 'graph'.
    * 'graph': the module-graph step.  'ge': graph with the pivoted
      solve (last resort — the no-pivot solve spends nothing on the
      six iota+reduce pivot-search kernels that cost 60% of the 'ge'
      step, profiled 2026-08-16, 35 vs 91-92 steps/s)."""
    import jax
    import jax.numpy as jnp
    import optax
    import flamo_tpu
    from flamo_tpu.core import masked_optimizer
    from flamo_tpu.models import build_active_acoustics
    from flamo_tpu.models.active_acoustics import (aa_fused_step,
                                                   aa_hoisted_room_step)
    from flamo_tpu.utils import host_eager, to_device

    if mode == "ge":
        solve_method = "ge"
    fused = mode in ("fused_tin", "fused_np", "fused")
    basis = ()
    with host_eager():
        m, x, target = _build_aa(solve_method)
        if mode == "fused_tin":
            from flamo_tpu.models.active_acoustics import aa_fused_taps_step

            multi, opt_state = aa_fused_taps_step(m, x, target, lr=1e-3,
                                                  pivot=False)
        elif fused:
            multi4, opt_state, er, ei = aa_fused_step(
                m, x, target, lr=1e-3, pivot=(mode == "fused"))
            basis = (jnp.asarray(er), jnp.asarray(ei))

            def multi(m, o, x, t, k, basis=basis):
                return multi4(m, o, x, t, basis[0], basis[1], k)

        elif mode == "hoisted":
            multi, opt_state = aa_hoisted_room_step(m, x, target, lr=1e-3)
        else:
            tx = masked_optimizer(optax.adam(1e-3), m)
            # NOTE: host-init + transfer, NOT jax.jit(tx.init) on device
            # — jit outputs carry non-default layouts on this backend
            # and the training executable then pays a layout conversion
            # per call (68x slower).
            opt_state = tx.init(m)

            def loss_fn(m, x, t):
                return jnp.mean((jnp.abs(m(x)) - t) ** 2)

            def multi(m, o, x, t, k):
                def body(c, _):
                    mm, oo = c
                    loss, g = jax.value_and_grad(loss_fn)(mm, x, t)
                    up, oo = tx.update(g, oo, mm)
                    return (optax.apply_updates(mm, up), oo), loss

                (m, o), ls = jax.lax.scan(body, (m, o), None, length=k)
                return m, o, ls[-1]

    m, opt_state, x, target = to_device((m, opt_state, x, target))
    if fused or mode == "hoisted":
        # forward loss-parity gate: first scanned loss must match the
        # module-graph loss at the same (init) parameters
        def graph_loss(m, x, t):
            return jnp.mean((jnp.abs(m(x)) - t) ** 2)

        def first_loss(m, o, x, t):
            return multi(m, o, x, t, 1)[2]

        lg = float(jax.jit(graph_loss)(m, x, target))
        lh = float(jax.jit(first_loss)(m, opt_state, x, target))
        # the fused path runs its contractions at f32 (HIGHEST) while
        # the graph reference's einsums use the TPU's default bf16
        # matmul passes, so even exact fused math sits ~1e-3 off the
        # graph loss (measured 1.15e-3, 2026-08-17); 5e-3 still catches
        # Mosaic miscompiles (those produce garbage, not 3e-3 — exact-
        # math parity is pinned at 1e-5 by tests/test_ops.py on CPU)
        tol = 5e-3 if fused else 1e-3
        if not (abs(lh - lg) / max(1e-9, abs(lg)) < tol):
            if fused:  # subprocess rung: exit nonzero, ladder moves on
                raise RuntimeError(
                    f"aa {mode} forward parity failed: {lh} vs {lg}")
            return measure_active_acoustics_steps_per_sec(
                k=k, n_calls=n_calls, mode="graph",
                solve_method=solve_method)

    jm = jax.jit(lambda m, o, x, t: multi(m, o, x, t, k),
                 donate_argnums=(0, 1))
    m, opt_state, loss = jm(m, opt_state, x, target)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        m, opt_state, loss = jm(m, opt_state, x, target)
    jax.block_until_ready(loss)
    sps = n_calls * k / (time.perf_counter() - t0)
    fl = float(loss)
    if not (fl == fl and 0.0 < fl < 1e3):
        if fused:
            raise RuntimeError(
                f"aa {mode} loss degenerated: {fl}")
        if mode == "hoisted":
            return measure_active_acoustics_steps_per_sec(
                k=k, n_calls=n_calls, mode="graph",
                solve_method=solve_method)
        if solve_method != "ge":
            # no-pivot breakdown on this loop: pivoted solve last resort
            return measure_active_acoustics_steps_per_sec(
                k=k, n_calls=n_calls, mode="ge")
        raise RuntimeError(f"active-acoustics loss degenerated: {fl}")
    return sps, fl


def measure_aa_evs_train_steps_per_sec(k: int = 100, n_calls: int = 3,
                                       iter_num: int = 30,
                                       n_mics: int = 4):
    """The reference's TRUE active-acoustics training workload
    (BASELINE.md line 20: 4 mics x 13 loudspeakers, RIR 15000, FIR 100,
    nfft 96000, EIGENVALUE loss — e8_active_acoustics.py:671-739):
    mse_evs over cycling 1601-bin partitions of the F_MM loop matrix,
    trainee U.  Runs models.aa_evs_train_step — linop-composed
    partition spectrum + the on-device char-poly eig (the axon TPU
    rejects host callbacks, so this objective was untrainable on that
    hardware before 2026-08-17).

    ``n_mics=8`` measures the largest rig the lanes-major
    char-poly + Durand-Kerner path covers (the functional.eigvals DK
    ceiling): per-bin 8x8 loop matrices, 8-root DK iteration — on-chip
    evidence for eigenvalue TRAINING above the 4-mic headline
    (VERDICT r4 next #3; rigs beyond N=8 route through the dense
    eigvals_qr_grad path, measured separately as evs_grad_n16)."""
    import jax
    import jax.numpy as jnp
    import flamo_tpu
    from flamo_tpu.models.active_acoustics import (ActiveAcoustics,
                                                   aa_evs_train_step)
    from flamo_tpu.utils import host_eager, to_device

    flamo_tpu.set_seed(130297)
    M = NFFT // 2 + 1
    with host_eager():
        aa = ActiveAcoustics(n_S=1, n_M=n_mics, n_L=13, n_A=1, nfft=NFFT,
                             FIR_order=100, rir_length=15000,
                             wgn_RT=1.0, room_t60=0.5)
        tg = jnp.full((M, n_mics), 0.3, dtype=jnp.float32)
        multi, opt_state, er, ei = aa_evs_train_step(aa, tg, lr=1e-3,
                                                     iter_num=iter_num)
        m = aa.F_MM
    m, opt_state, er, ei, tg = to_device((m, opt_state,
                                          jnp.asarray(er), jnp.asarray(ei),
                                          tg))
    jm = jax.jit(lambda m, o, er, ei, tg, s: multi(m, o, er, ei, tg, s, k),
                 donate_argnums=(0, 1))
    m, opt_state, loss = jm(m, opt_state, er, ei, tg, 0)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for c in range(1, n_calls + 1):
        m, opt_state, loss = jm(m, opt_state, er, ei, tg, c * k)
    jax.block_until_ready(loss)
    sps = n_calls * k / (time.perf_counter() - t0)
    fl = float(loss[-1])
    if not (fl == fl and 0.0 <= fl < 1e3):
        raise RuntimeError(f"aa evs loss degenerated: {fl}")
    return sps


def measure_evs_grad_calls_per_sec(nbins: int = 1600, n_calls: int = 50,
                                   N: int = 4):
    """Eigenvalue-objective training step rate: value_and_grad of the
    optimize.mse_evs shape (sorted |eig| magnitude MSE over one bin
    partition of (nbins, N, N) loop matrices — the reference
    e8_active_acoustics.py:564-621 objective at its per-step partition
    size for M=48001, iter_num=30).

    On the axon tunnel N<=8 exercises functional.eigvals_dk (on-device
    char-poly + Durand-Kerner eig); 8 < N <= 64 exercises
    eigvals_qr_grad (batched Hessenberg/shifted-QR values + inverse-
    iteration eigvector recovery for the closed-form VJP) — host
    callbacks are rejected outright there, so before 2026-08-17/18
    these objectives could not train on the TPU at all.  Inputs ship as
    re/im (complex host->device transfers flake on the tunnel)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from flamo_tpu.functional import eigvals

    rng = np.random.default_rng(0)
    ar = jnp.asarray(rng.normal(size=(nbins, N, N)).astype(np.float32))
    ai = jnp.asarray(rng.normal(size=(nbins, N, N)).astype(np.float32))
    t = jnp.asarray(rng.uniform(size=(nbins, N)).astype(np.float32))

    def loss(ar, ai, t):
        m = jnp.abs(eigvals(jax.lax.complex(ar, ai)))
        return jnp.mean((jnp.sort(m, axis=-1) - t) ** 2)

    vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    r = vg(ar, ai, t)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        r = vg(ar, ai, t)
    jax.block_until_ready(r)
    if not np.isfinite(float(r[0])):
        raise RuntimeError("evs grad loss not finite")
    return n_calls / (time.perf_counter() - t0)


def measure_n64_solve_ms(n_calls: int = 20):
    """N=64 closed-loop solve fwd+bwd (VERDICT r1 next #9): times the
    fori_loop Gaussian elimination (gauss_solve_loop) against batched LU
    so the N>32 path's TPU viability is measured whenever the backend
    admits fori_loop programs (axon historically raises UNIMPLEMENTED —
    closed_loop_solve routes it to LU; this measures both directly).
    Returns {'n64_ge_loop_ms': .., 'n64_lu_ms': ..} with error strings
    where a path is blocked."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flamo_tpu.ops.solve import gauss_solve_loop

    M, N = 3001, 64
    rng = np.random.default_rng(0)
    # operands ship as REAL re/im parts and are combined in-jit: complex
    # host->device transfers flake on the tunnel (CLAUDE.md), and the
    # failure then masquerades as a solver error at fetch time
    phase = rng.uniform(0, 2 * np.pi, (M, N))
    Dn = (0.9 * np.exp(1j * phase)).astype(np.complex64)
    W = rng.normal(size=(N, N)).astype(np.float32)
    W = np.linalg.qr(W)[0].astype(np.float32)
    An = (np.eye(N, dtype=np.complex64)[None]
          - Dn[:, :, None] * W[None].astype(np.complex64))
    Bn = (rng.normal(size=(M, N))
          + 1j * rng.normal(size=(M, N))).astype(np.complex64)
    ar, ai = jnp.asarray(An.real.copy()), jnp.asarray(An.imag.copy())
    br, bi = jnp.asarray(Bn.real.copy()), jnp.asarray(Bn.imag.copy())

    def loss_ge(ar, ai, br, bi):
        return jnp.sum(jnp.abs(gauss_solve_loop(
            jax.lax.complex(ar, ai), jax.lax.complex(br, bi))) ** 2)

    def loss_lu(ar, ai, br, bi):
        return jnp.sum(jnp.abs(jnp.linalg.solve(
            jax.lax.complex(ar, ai),
            jax.lax.complex(br, bi)[..., None])[..., 0]) ** 2)

    out = {}
    for name, fn in (("n64_ge_loop_ms", loss_ge), ("n64_lu_ms", loss_lu)):
        try:
            vg = jax.jit(jax.value_and_grad(fn, argnums=(0, 1, 2, 3)))
            r = vg(ar, ai, br, bi)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(n_calls):
                r = vg(ar, ai, br, bi)
            jax.block_until_ready(r)
            out[name] = round((time.perf_counter() - t0) / n_calls * 1e3, 3)
        except Exception as e:  # pragma: no cover - backend-dependent
            out[name] = f"error: {str(e)[:80]}"
    return out


def measure_torch_baseline(n_steps: int = 10):
    """Same mathematical train step in PyTorch on CPU (the reference's
    execution model: eager torch, float32) — independent implementation of
    the e8 colorless-FDN step for timing."""
    import numpy as np
    import torch

    torch.manual_seed(130709)
    N = len(DELAYS)
    M = NFFT // 2 + 1
    delays = torch.tensor(DELAYS, dtype=torch.float32)
    input_gain = torch.randn(N, 1, requires_grad=True)
    output_gain = torch.randn(1, N, requires_grad=True)
    W = torch.randn(N, N, requires_grad=True)
    gamma = 10 ** (-30.0 / NFFT / 20)
    omega = 2 * torch.pi * torch.arange(M) / NFFT
    x = torch.zeros(1, M, 1)
    x[:, 0, :] = 1.0
    target = torch.ones(1, M, 1)
    opt = torch.optim.Adam([input_gain, output_gain, W], lr=1e-3)

    def step():
        opt.zero_grad()
        X = torch.fft.rfft(x, n=NFFT, dim=1)
        U = torch.matrix_exp(torch.triu(W, 1) - torch.triu(W, 1).T)
        D = (gamma ** delays)[None, :] * torch.exp(
            -1j * omega[:, None] * delays[None, :])
        # closed loop (I - D U)^(-1) D applied per bin
        I = torch.eye(N, dtype=torch.complex64).expand(M, N, N)
        A = I - D[:, :, None] * U[None, :, :].to(torch.complex64)
        u_in = input_gain.to(torch.complex64) @ X.permute(1, 2, 0)  # (M,N,1)
        B = D[:, :, None] * u_in
        y = torch.linalg.solve(A, B)
        out = (output_gain.to(torch.complex64) @ y).permute(2, 0, 1)
        est = torch.abs(out)
        mse = torch.mean((est.sum(-1) - target.squeeze(-1)) ** 2)
        sp = -(torch.sum(torch.abs(U)) - N * np.sqrt(N)) / (
            N * (np.sqrt(N) - 1))
        loss = mse + 0.2 * sp
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    return n_steps / (time.perf_counter() - t0)


def measure_torch_freq_evals_baseline(n_evals: int = 5):
    """Reference side of the SECONDARY metric (BASELINE.md line 15):
    ``Shell.get_freq_response`` evaluations/sec for the colorless FDN at
    nfft=96000 — the same per-bin closed-loop response math as the train
    step minus loss/backward/update (reference system.py:1081-1153),
    eager torch float32 on CPU."""
    import torch

    torch.manual_seed(130709)
    N = len(DELAYS)
    M = NFFT // 2 + 1
    delays = torch.tensor(DELAYS, dtype=torch.float32)
    input_gain = torch.randn(N, 1)
    output_gain = torch.randn(1, N)
    W = torch.randn(N, N)
    gamma = 10 ** (-30.0 / NFFT / 20)
    omega = 2 * torch.pi * torch.arange(M) / NFFT
    x = torch.zeros(1, M, 1)
    x[:, 0, :] = 1.0

    @torch.no_grad()
    def eval_response():
        X = torch.fft.rfft(x, n=NFFT, dim=1)
        U = torch.matrix_exp(torch.triu(W, 1) - torch.triu(W, 1).T)
        D = (gamma ** delays)[None, :] * torch.exp(
            -1j * omega[:, None] * delays[None, :])
        I = torch.eye(N, dtype=torch.complex64).expand(M, N, N)
        A = I - D[:, :, None] * U[None, :, :].to(torch.complex64)
        u_in = input_gain.to(torch.complex64) @ X.permute(1, 2, 0)
        B = D[:, :, None] * u_in
        y = torch.linalg.solve(A, B)
        out = (output_gain.to(torch.complex64) @ y).permute(2, 0, 1)
        return torch.abs(out)

    eval_response()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_evals):
        eval_response()
    return n_evals / (time.perf_counter() - t0)


def measure_torch_attenuated_baseline(n_steps: int = 3):
    """Reference side of the attenuated-FDN metric: an independent
    eager-torch-CPU implementation of the identical training step
    (e8_fdn topology — delays feedforward, Series(orthogonal mixing,
    sigmoid-mapped 13-band GEQ) feedback, magnitude-MSE on the
    closed-loop response, Adam).  The per-step work mirrors the
    reference's execution model: per-line GEQ biquad design from the
    command gains (RBJ peak/shelf formulas — simpler than the
    reference's design math, which only flatters the baseline), SOS
    cascade evaluated on the full rfft grid, dense per-bin closed-loop
    solve, full backward."""
    import torch

    torch.manual_seed(130709)
    N = len(DELAYS)
    M = NFFT // 2 + 1
    fs = 48000.0
    delays = torch.tensor(DELAYS, dtype=torch.float32)
    centers = [31.25 * 2 ** i for i in range(10)]  # octave bands
    sh_lo = centers[0] / 2 ** 0.5
    sh_hi = centers[-1] * 2 ** 0.5
    omega = 2 * torch.pi * torch.arange(M) / NFFT
    z1 = torch.exp(-1j * omega)  # z^-1 on the rfft grid
    z2 = z1 * z1

    input_gain = torch.randn(N, 1, requires_grad=True)
    output_gain = torch.randn(1, N, requires_grad=True)
    W = torch.randn(N, N, requires_grad=True)
    geq_raw = torch.randn(12, N, requires_grad=True)  # 12 bands/line
    opt = torch.optim.Adam([input_gain, output_gain, W, geq_raw],
                           lr=1e-4)
    x = torch.zeros(1, M, 1)
    x[:, 0, :] = 1.0
    target = torch.ones(1, M, 1)

    def biquad(gain_db, f0, Q, kind):
        # RBJ peaking / shelving sections, vectorized over the N lines
        A = 10 ** (gain_db / 40.0)
        import math
        w0 = 2 * math.pi * f0 / fs
        alpha = math.sin(w0) / (2 * Q)
        cw = math.cos(w0)
        if kind == "peak":
            b = torch.stack([1 + alpha * A, (-2 * cw) * torch.ones_like(A),
                             1 - alpha * A])
            a = torch.stack([1 + alpha / A, (-2 * cw) * torch.ones_like(A),
                             1 - alpha / A])
        else:  # shelf (low/high by sign convention of f0 choice)
            sA = torch.sqrt(A)
            common = 2 * sA * alpha
            if kind == "lowshelf":
                b = torch.stack([A * ((A + 1) - (A - 1) * cw + common),
                                 2 * A * ((A - 1) - (A + 1) * cw),
                                 A * ((A + 1) - (A - 1) * cw - common)])
                a = torch.stack([(A + 1) + (A - 1) * cw + common,
                                 -2 * ((A - 1) + (A + 1) * cw),
                                 (A + 1) + (A - 1) * cw - common])
            else:
                b = torch.stack([A * ((A + 1) + (A - 1) * cw + common),
                                 -2 * A * ((A - 1) + (A + 1) * cw),
                                 A * ((A + 1) + (A - 1) * cw - common)])
                a = torch.stack([(A + 1) - (A - 1) * cw + common,
                                 2 * ((A - 1) - (A + 1) * cw),
                                 (A + 1) - (A - 1) * cw - common])
        return b, a  # (3, N)

    def step():
        opt.zero_grad()
        X = torch.fft.rfft(x, n=NFFT, dim=1)
        U = torch.matrix_exp(torch.triu(W, 1) - torch.triu(W, 1).T)
        gains_db = 20 * torch.log10(torch.sigmoid(geq_raw))  # (12, N)
        H = torch.ones(M, N, dtype=torch.complex64)
        specs = ([("lowshelf", sh_lo, 0.7071)]
                 + [("peak", f0, 4.318) for f0 in centers]
                 + [("highshelf", sh_hi, 0.7071)])
        for k, (kind, f0, Q) in enumerate(specs):
            b, a = biquad(gains_db[k], f0, Q, kind)
            bc = b.to(torch.complex64)
            ac = a.to(torch.complex64)
            num = (bc[0][None, :] + bc[1][None, :] * z1[:, None]
                   + bc[2][None, :] * z2[:, None])
            den = (ac[0][None, :] + ac[1][None, :] * z1[:, None]
                   + ac[2][None, :] * z2[:, None])
            H = H * (num / den)
        D = torch.exp(-1j * omega[:, None] * delays[None, :])
        B = H[:, :, None] * U.to(torch.complex64)[None, :, :]
        I = torch.eye(N, dtype=torch.complex64).expand(M, N, N)
        A = I - D[:, :, None] * B
        u_in = input_gain.to(torch.complex64) @ X.permute(1, 2, 0)
        y = torch.linalg.solve(A, D[:, :, None] * u_in)
        out = (output_gain.to(torch.complex64) @ y).permute(2, 0, 1)
        mse = torch.mean((torch.abs(out) - target) ** 2)
        mse.backward()
        opt.step()
        return float(mse.detach())

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    return n_steps / (time.perf_counter() - t0)


def measure_torch_aa_baseline(n_steps: int = 3):
    """Reference side of the active-acoustics magnitude metric: an
    independent eager-torch-CPU implementation of the identical step
    (4 mics x 13 loudspeakers MIMO loop, RIR 15000, FIR order 100,
    nfft=96000 — room and mixer responses recomputed per step exactly
    as the reference's eager forward does, dense (M, 4, 4) closed-loop
    solve, magnitude MSE, Adam on the mixer taps)."""
    import torch

    torch.manual_seed(130297)
    n_m, n_l, rir, order = 4, 13, 15000, 100
    M = NFFT // 2 + 1
    env = torch.exp(-6.9077553 * torch.arange(rir) / (0.5 * 48000))
    rooms = torch.randn(rir, n_m, n_l) * env[:, None, None]
    taps = (0.01 * torch.randn(order, n_l, n_m)).requires_grad_(True)
    opt = torch.optim.Adam([taps], lr=1e-3)
    X = torch.ones(M, n_l, dtype=torch.complex64)  # rfft of the impulse
    target = torch.ones(M, n_m)

    def step():
        opt.zero_grad()
        H = torch.fft.rfft(rooms, n=NFFT, dim=0)  # (M, n_m, n_l)
        G = torch.fft.rfft(taps.to(torch.float32), n=NFFT, dim=0)
        A = (torch.eye(n_m, dtype=torch.complex64).expand(M, n_m, n_m)
             - torch.einsum("mil,mlk->mik", H, G))
        rhs = torch.einsum("mil,ml->mi", H, X)
        y = torch.linalg.solve(A, rhs[..., None])[..., 0]
        mse = torch.mean((torch.abs(y) - target) ** 2)
        mse.backward()
        opt.step()
        return float(mse.detach())

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    return n_steps / (time.perf_counter() - t0)


def get_baseline(refresh: bool = False):
    """Cached torch-CPU baselines: primary train steps/s + secondary
    freq-response evals/s.  Returns the dict; re-measures any missing
    entry and rewrites the cache."""
    data = {}
    if not refresh and os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            data = json.load(f)
    changed = False
    if "torch_cpu_steps_per_sec" not in data:
        data["torch_cpu_steps_per_sec"] = measure_torch_baseline()
        data["workload"] = "colorless_fdn nfft=96000 N=6"
        changed = True
    if "torch_cpu_freq_evals_per_sec" not in data:
        data["torch_cpu_freq_evals_per_sec"] = (
            measure_torch_freq_evals_baseline())
        changed = True
    if "torch_cpu_attenuated_steps_per_sec" not in data:
        data["torch_cpu_attenuated_steps_per_sec"] = (
            measure_torch_attenuated_baseline())
        changed = True
    if "torch_cpu_aa_steps_per_sec" not in data:
        data["torch_cpu_aa_steps_per_sec"] = measure_torch_aa_baseline()
        changed = True
    if "torch_cpu_sfdn_steps_per_sec" not in data:
        data["torch_cpu_sfdn_steps_per_sec"] = (
            measure_torch_sfdn_baseline())
        changed = True
    if changed or refresh:
        with open(BASELINE_CACHE, "w") as f:
            json.dump(data, f)
    return data


def pallas_forward_gate(candidate: str = "pallas"):
    """On-chip forward-parity gate for ONE fused Pallas kernel: the loss
    of the init colorless model through `candidate` must match the XLA
    ge_cached solve to f32 resolution (verified 2026-08-16: 6.533935 vs
    6.5339346 on the tunnel).  Gating only the kernel under test keeps
    one broken rung from disabling the whole ladder.  Raises on mismatch
    so the --scan-only subprocess exits nonzero and the caller moves on."""
    import jax
    import jax.numpy as jnp
    import flamo_tpu
    from flamo_tpu.models import build_colorless_fdn
    from flamo_tpu.models.colorless_fdn import (
        colorless_loss, colorless_loss_fused_step, colorless_loss_fused_tf)
    from flamo_tpu.utils import host_eager, to_device

    losses = {}
    for method in ("ge_cached", candidate):
        flamo_tpu.set_seed(130709)  # identical init for both builds
        solve = "ge_cached" if method.startswith("pallas_") else method
        with host_eager():
            m = build_colorless_fdn(nfft=NFFT, delays=DELAYS,
                                    solve_method=solve)
            M = NFFT // 2 + 1
            x = jnp.zeros((1, M, 1)).at[:, 0, :].set(1.0)
            t = jnp.ones((1, M, 1))
        m, x, t = to_device((m, x, t))
        if method == "pallas_tf":
            fn = colorless_loss_fused_tf
        elif method == "pallas_step":
            fn = colorless_loss_fused_step
        elif method == "pallas_step_np":
            def fn(m, x, t):
                return colorless_loss_fused_step(m, x, t, pivot=False)
        else:
            fn = colorless_loss
        losses[method] = float(jax.jit(fn)(m, x, t))
    rel = (abs(losses[candidate] - losses["ge_cached"])
           / max(1e-9, abs(losses["ge_cached"])))
    if rel > 1e-3:
        raise RuntimeError(
            f"{candidate} forward parity failed: {losses}, rel={rel:.2e}")


def scan_bench_subprocess(solve_method: str, timeout: int):
    """Run the scan bench in a subprocess with a hard timeout.

    Mosaic custom calls HANG on the axon tunnel (CLAUDE.md), so the pallas
    mode must not be allowed to wedge the whole bench: on timeout or crash
    the caller falls back to the XLA kernel.  Returns (result|None, err)."""
    import subprocess
    import sys

    cmd = [sys.executable, os.path.abspath(__file__), "--scan-only",
           "--solve", solve_method]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=timeout)
    except subprocess.TimeoutExpired:
        return None, f"timeout after {timeout}s (Mosaic hang?)"
    if out.returncode == 0:
        res = _last_json_line(out.stdout)
        if res is not None:
            return res, None
    return None, f"rc={out.returncode}: {out.stderr.strip()[-120:]}"


def _last_json_line(stdout: str):
    """Last parseable JSON line of a subprocess' stdout (log lines and
    backend warnings may precede/interleave it)."""
    for line in reversed(stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return None


def tunnel_health_probe(timeout: int = 240) -> bool:
    """The axon tunnel has been observed to wedge HARD (2026-08-20: even
    ``jax.devices()`` hangs, so no in-process timeout can fire).  Probe
    backend init + one trivial jit in a subprocess with a wall-clock
    timeout, so a dead tunnel yields a diagnosable JSON error line
    instead of a driver-stalling hang.  The generous timeout covers the
    plugin's cold init (~20-40 s) on a loaded host."""
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp; "
            "print(float(jax.jit(lambda x: x + 1)(jnp.ones(4)).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           capture_output=True, text=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true",
                    help="print the full metric table")
    ap.add_argument("--refresh-baseline", action="store_true")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--solve", type=str, default="auto",
                    choices=["auto", "ge_cached", "ge", "ge_nopivot",
                             "ge_mat", "pallas", "pallas_tf",
                             "pallas_step", "pallas_step_np", "lu"],
                    help="solve kernel for the scan bench.  'auto' "
                         "(default) tries the fused FDN Mosaic kernel in a "
                         "gated subprocess (forward-parity check + hard "
                         "timeout — Mosaic has hung on this tunnel in the "
                         "past) and falls back to the XLA ge_cached kernel; "
                         "'pallas' forces the fused kernel")
    ap.add_argument("--timeout", type=int, default=1500,
                    help="subprocess timeout for the pallas attempt "
                         "(gate + train-step compiles take ~5-8 min on "
                         "the tunnel, much longer if the host is loaded)")
    ap.add_argument("--cache-delays", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="freeze-cache the delay-line responses (re/im "
                         "leaves) instead of recomputing them per step "
                         "(measured ~+5%% on the scan bench; falls back to "
                         "the uncached build if the backend rejects the "
                         "carried leaves)")
    ap.add_argument("--scan-only", action="store_true",
                    help=argparse.SUPPRESS)
    ap.add_argument("--ensemble-only", type=str, default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--attenuated-only", type=str, default=None,
                    choices=["fused_np", "fused", "pallas", "xla"],
                    help=argparse.SUPPRESS)
    ap.add_argument("--aa-only", type=str, default=None,
                    choices=["fused_tin", "fused_np", "fused", "hoisted",
                             "graph", "ge"],
                    help=argparse.SUPPRESS)
    ap.add_argument("--sfdn-only", type=str, default=None,
                    choices=["masked_ge_cached", "masked_pallas",
                             "masked_ge_nopivot", "pallas", "ge_nopivot",
                             "ge_cached", "ge"],
                    help=argparse.SUPPRESS)
    ap.add_argument("--n64-only", action="store_true",
                    help=argparse.SUPPRESS)
    args = ap.parse_args()

    # sub-invocation modes are only ever launched by a parent bench whose
    # own probe already passed — don't pay the probe again per rung
    sub_mode = (args.scan_only or args.n64_only
                or args.ensemble_only is not None
                or args.attenuated_only is not None
                or args.aa_only is not None or args.sfdn_only is not None)
    if not sub_mode and not tunnel_health_probe():
        print(json.dumps({
            "metric": "colorless_fdn_train_steps_per_sec_nfft96000",
            "value": 0.0,
            "unit": "steps/s", "vs_baseline": 0.0,
            "error": "device backend unresponsive (health probe timed "
                     "out before any measurement — on the axon tunnel "
                     "this means the tunnel itself is down; rerun later "
                     "and see BENCH.md for the last recorded bands)"}))
        return

    if args.n64_only:
        print(json.dumps(measure_n64_solve_ms()))
        return

    if args.sfdn_only is not None:
        sps, fl, l20 = measure_sfdn_steps_per_sec(solve_method=args.sfdn_only)
        print(json.dumps({"steps_per_sec": sps, "final_loss": fl,
                          "loss20": l20}))
        return

    if args.ensemble_only is not None:
        v = measure_ensemble_steps_per_sec(solve_method=args.ensemble_only)
        print(json.dumps({"model_steps_per_sec": v}))
        return

    if args.aa_only is not None:
        mode = args.aa_only
        # the fused step is ~100x faster per step: longer scan amortizes
        # the tunnel's per-dispatch latency (parity gate is in-function)
        k = 400 if mode in ("fused_tin", "fused_np", "fused") else 20
        sps, fl = measure_active_acoustics_steps_per_sec(k=k, mode=mode)
        print(json.dumps({"steps_per_sec": sps, "final_loss": fl}))
        return

    if args.attenuated_only is not None:
        mode = args.attenuated_only
        if mode in ("fused_np", "fused"):
            # nonzero exit on mismatch -> the caller tries the next rung
            attenuated_forward_gate(mode)
        # the fused step is ~5x faster per step: longer scan to amortize
        # the tunnel's per-dispatch latency
        k = 1600 if mode in ("fused_np", "fused") else 400
        sps, fl = measure_attenuated_fdn_steps_per_sec(k=k, mode=mode)
        print(json.dumps({"steps_per_sec": sps, "final_loss": fl}))
        return

    if args.scan_only:
        if args.solve.startswith("pallas"):
            # nonzero exit on mismatch -> the caller tries the next rung
            pallas_forward_gate(args.solve)
        solve = "ge_cached" if args.solve == "auto" else args.solve
        # the fused kernel's ~100 us step needs a longer scan to amortize
        # the tunnel's per-dispatch latency (K sweep 2026-08-16:
        # post-masked-optimizer sweep 2026-08-17:
        # 12001/12280/12459 steps/s at K=3200/6400/12800 -> K=6400
        k = 6400 if solve.startswith("pallas") else 400
        sps, fl = measure_jax_scan_steps_per_sec(
            k=k, solve_method=solve, cache_delays=args.cache_delays)
        print(json.dumps({"steps_per_sec": sps, "final_loss": fl}))
        return

    baselines = get_baseline(refresh=args.refresh_baseline)
    baseline = baselines["torch_cpu_steps_per_sec"]
    fallback_note = None
    solve_used = args.solve
    steps_per_sec = final_loss = None
    if args.solve == "auto" or args.solve.startswith("pallas"):
        # auto tries the fused STEP kernel (loss+grads in one pass) first,
        # then the fused solve kernel; one retry each — with the
        # persistent compile cache warm, a retry after a transient flaky
        # phase is cheap
        candidates = (["pallas_step_np", "pallas_step", "pallas_tf",
                       "pallas"]
                      if args.solve == "auto" else [args.solve])
        res = err = None
        notes = []
        for cand in candidates:
            for timeout in (args.timeout, args.timeout // 2):
                res, err = scan_bench_subprocess(cand, timeout)
                if res is not None:
                    break
                if "timeout" not in str(err):
                    # nonzero exit (e.g. parity-gate failure) is
                    # deterministic — don't burn another compile retrying
                    break
            if res is not None:
                steps_per_sec = res["steps_per_sec"]
                final_loss = res["final_loss"]
                solve_used = cand
                fallback_note = None  # earlier rung failures don't taint it
                if notes:
                    fallback_note = "; ".join(notes) + f"; used {cand}"
                break
            notes.append(f"{cand} failed ({err})")
            if "timeout" in str(err):
                # Mosaic-hang phases are correlated across kernels: do not
                # burn another 4x timeout budget on the remaining rungs
                notes.append("timeout -> skipping remaining pallas rungs")
                break
        if res is None:
            fallback_note = "; ".join(notes) + "; fell back to ge_cached"
            solve_used = "ge_cached"
    if steps_per_sec is None:
        solve = ("ge_cached" if args.solve == "auto"
                 or args.solve.startswith("pallas") else args.solve)
        solve_used = solve
        k = 6400 if solve.startswith("pallas") else 400
        try:
            steps_per_sec, final_loss = measure_jax_scan_steps_per_sec(
                k=k, solve_method=solve, cache_delays=args.cache_delays)
        except Exception:
            if not args.cache_delays:
                raise
            # carried cached-response leaves intermittently hit backend
            # UNIMPLEMENTED on the tunnel (CLAUDE.md) — rebuild uncached
            fallback_note = "cache_delays failed; fell back to uncached"
            steps_per_sec, final_loss = measure_jax_scan_steps_per_sec(
                k=k, solve_method=solve, cache_delays=False)
    # the colorless loss after 800 steps sits near 0.81 on the pivoted
    # kernel; a degenerate no-pivot solve would blow this up or NaN
    if not (final_loss == final_loss and 0.0 < final_loss < 10.0):
        steps_per_sec, final_loss = measure_jax_scan_steps_per_sec(
            solve_method="ge")
        solve_used = "ge"
    result = {
        "metric": "colorless_fdn_train_steps_per_sec_nfft96000",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / baseline, 2),
    }
    if solve_used != "ge_cached":
        result["solve_method"] = solve_used
    if fallback_note:
        result["fallback"] = fallback_note
    if args.all:
        extra = {
            "torch_cpu_baseline_steps_per_sec": round(baseline, 3),
            "final_loss": final_loss,
        }
        evals_baseline = baselines.get("torch_cpu_freq_evals_per_sec")
        # (name, fn, repeats): the tunnel's dispatch/transfer bandwidth
        # goes through slow phases (measured 70x on the ensemble metric
        # while latency-bound controls held) — throughput metrics take
        # the best of two runs so one bad phase doesn't land in the table
        # ensembles in a FRESH SUBPROCESS: running them after any other
        # metric in the same process degrades them ~60x (reproduced
        # deterministically — in-process backend state, not tunnel phase)
        import subprocess
        import sys

        def _ensemble_subprocess(method):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--ensemble-only", method]
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=args.timeout)
            res = _last_json_line(out.stdout)
            if res is not None and "model_steps_per_sec" in res:
                return res["model_steps_per_sec"]
            raise RuntimeError(out.stderr.strip()[-60:])

        def _attenuated_subprocess(mode, timeout):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--attenuated-only", mode]
            try:
                out = subprocess.run(cmd, capture_output=True, text=True,
                                     timeout=timeout)
            except subprocess.TimeoutExpired:
                return None
            if out.returncode != 0:
                return None
            return _last_json_line(out.stdout)

        def _attenuated_best_backend():
            # ladder: fused single-pass step kernel (no-pivot, then
            # pivoted), then the separate-kernels Pallas path (fused
            # cascade + fused solve), then the XLA fallback.  Each fused
            # rung runs in a subprocess behind the forward-parity gate +
            # timeout (Mosaic hangs on the tunnel must not wedge the
            # bench) and is loss-gated like the colorless ladder.
            for mode in ("fused_np", "fused", "pallas"):
                res = _attenuated_subprocess(mode, args.timeout)
                if res is None:
                    continue
                fl = res.get("final_loss")
                if fl is not None and fl == fl and 0.0 < fl < 10.0:
                    return res["steps_per_sec"]
            return measure_attenuated_fdn_steps_per_sec(mode="xla")[0]

        def _sfdn_subprocess(method, timeout):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--sfdn-only", method]
            try:
                out = subprocess.run(cmd, capture_output=True, text=True,
                                     timeout=timeout)
            except subprocess.TimeoutExpired:
                return None
            if out.returncode != 0:
                return None
            return _last_json_line(out.stdout)

        def _sfdn_best_backend():
            # solve ladder on the frequency-dependent scattering loop:
            # the masked-bin fast path (responses via response_at —
            # MXU DFT contraction + closed-form delay phasors, loop
            # assembled/solved only at each step's 2000 masked bins),
            # the generic Pallas elimination kernel, the no-pivot XLA
            # elimination, then the cached-factor pivoted solve.  Each
            # rung in a subprocess (Mosaic hangs / in-process
            # contamination must not wedge the table).  Gate: every
            # rung runs the identical seeded schedule, and its loss AT
            # STEP 20 must sit within 2% of the pivoted ge_cached
            # anchor's — at step 20 the trajectories are still
            # f32-lockstep, so a miscompiled rung fails loudly, while
            # 600-step FINAL losses of this chaotic objective spread
            # O(0.5) from rounding alone (measured: masked 1.46 vs
            # graph 1.86, identical masks/objective — a final-loss gate
            # rejects healthy rungs).  Finals only sanity-check
            # finite/positive.  Among gated rungs the FASTEST wins.
            rungs = ("masked_ge_cached", "masked_pallas", "pallas",
                     "ge_nopivot", "ge_cached")
            results = {}
            for method in rungs:
                res = _sfdn_subprocess(method, args.timeout)
                if res is None:
                    continue
                fl = res.get("final_loss")
                l20 = res.get("loss20")
                if (fl is not None and fl == fl and 0.0 < fl
                        and l20 is not None and l20 == l20 and 0.0 < l20):
                    results[method] = (res["steps_per_sec"], l20)
            if results:
                # anchor on the pivoted solve; with no anchor, gate the
                # rungs against their own median step-20 loss
                if "ge_cached" in results:
                    ref = results["ge_cached"][1]
                else:
                    l20s = sorted(l for _, l in results.values())
                    ref = l20s[len(l20s) // 2]
                passing = [sps for sps, l20 in results.values()
                           if abs(l20 - ref) <= max(0.02 * abs(ref), 1e-4)]
                if passing:
                    return max(passing)
            return measure_sfdn_steps_per_sec(solve_method="ge")[0]

        def _aa_subprocess(mode, timeout):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--aa-only", mode]
            try:
                out = subprocess.run(cmd, capture_output=True, text=True,
                                     timeout=timeout)
            except subprocess.TimeoutExpired:
                return None
            if out.returncode != 0:
                return None
            return _last_json_line(out.stdout)

        def _aa_best_backend():
            # ladder: response-rows fused step, then the taps-in kernel,
            # each in a gated subprocess; then the in-process
            # hoisted/graph/ge chain
            # (measure_active_acoustics_steps_per_sec falls back on
            # parity or loss-gate failure by itself).  fused_tin leads:
            # the 3-pass emulated-HIGH taps-in kernel measured 4835-4848
            # vs fused_np's 4472 steps/s same-session on-chip
            # (2026-08-19; Mosaic has no HIGH dot lowering — the kernel
            # splits operands into bf16 hi/lo parts and issues 3 DEFAULT
            # dots.  fused_tin@HIGHEST had measured SLOWER, 3616 vs
            # 4387: the basis matmuls are pass-bound, not
            # bandwidth-bound).
            for mode in ("fused_tin", "fused_np"):
                res = _aa_subprocess(mode, args.timeout)
                if res is None:
                    continue
                fl = res.get("final_loss")
                if fl is not None and fl == fl and 0.0 < fl < 1e3:
                    return res["steps_per_sec"]
            return measure_active_acoustics_steps_per_sec()[0]

        for name, fn, reps in [
            ("ensemble8_model_steps_per_sec",
             lambda: _ensemble_subprocess("ge_cached"), 2),
            ("ensemble8_pallas_model_steps_per_sec",
             lambda: _ensemble_subprocess("pallas"), 2),
            ("single_dispatch_steps_per_sec",
             lambda: measure_jax_steps_per_sec(args.steps)[0], 1),
            ("freq_response_evals_per_sec", measure_jax_evals_per_sec, 1),
            ("attenuated_fdn_steps_per_sec",
             _attenuated_best_backend, 2),
            # reps=1: the 5-rung subprocess ladder is itself ~15-20 min
            # of compiles at nfft=96000; the fastest-gated-rung rule
            # already absorbs per-run noise across five measurements
            ("sfdn_train_steps_per_sec", _sfdn_best_backend, 1),
            ("active_acoustics_steps_per_sec",
             _aa_best_backend, 2),
            ("evs_grad_steps_per_sec",
             measure_evs_grad_calls_per_sec, 1),
            ("evs_grad_n16_steps_per_sec",
             lambda: measure_evs_grad_calls_per_sec(n_calls=10, N=16), 1),
            ("aa_evs_train_steps_per_sec",
             measure_aa_evs_train_steps_per_sec, 1),
            ("aa_evs8_train_steps_per_sec",
             lambda: measure_aa_evs_train_steps_per_sec(n_mics=8), 1),
        ]:
            vals, last_err = [], None
            for _ in range(reps):
                try:
                    vals.append(float(fn()))
                except Exception as e:  # pragma: no cover - flaky backend
                    last_err = e
            extra[name] = (round(max(vals), 3) if vals
                           else f"error: {str(last_err)[:60]}")
            if (name == "freq_response_evals_per_sec" and vals
                    and evals_baseline):
                extra["freq_evals_vs_baseline"] = round(
                    max(vals) / evals_baseline, 2)
                extra["torch_cpu_freq_evals_per_sec"] = round(
                    evals_baseline, 3)
            for metric, bkey in (
                    ("attenuated_fdn_steps_per_sec",
                     "torch_cpu_attenuated_steps_per_sec"),
                    ("sfdn_train_steps_per_sec",
                     "torch_cpu_sfdn_steps_per_sec"),
                    ("active_acoustics_steps_per_sec",
                     "torch_cpu_aa_steps_per_sec")):
                if name == metric and vals and baselines.get(bkey):
                    extra[metric.replace("_steps_per_sec",
                                         "_vs_baseline")] = round(
                        max(vals) / baselines[bkey], 2)
                    extra[bkey] = round(baselines[bkey], 3)
        # n64 in a FRESH SUBPROCESS: in-process it degrades ~1700x after
        # the other metrics run (104 ms vs 0.061 ms standalone, BENCH.md
        # r4 — same backend-state contamination the ensembles metric
        # hits); the subprocess reading is the number of record
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--n64-only"],
                capture_output=True, text=True, timeout=args.timeout)
            res = _last_json_line(out.stdout)
            if out.returncode == 0 and res is not None:
                extra.update(res)
            else:
                raise RuntimeError(out.stderr.strip()[-60:])
        except Exception as e:  # pragma: no cover - backend flakiness
            extra["n64_solve"] = f"error: {str(e)[:60]}"
        print(json.dumps({**result, **extra}))
    else:
        print(json.dumps(result))


if __name__ == "__main__":
    main()
