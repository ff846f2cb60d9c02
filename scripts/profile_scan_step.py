"""Profile a scan training step on the attached TPU and print a
per-kernel time breakdown.

Captures a jax.profiler trace of one jitted K-step scan call, converts it
to a perfetto trace, and aggregates device-side event durations by kernel
name.  Used to find the launch-overhead tail documented in CLAUDE.md
(92 us/step at K=400: fused solve kernels ~46%, remainder ~130 small
kernels).

Workloads: 'colorless' (the flagship), 'attenuated' (e8_fdn GEQ-in-loop;
--solve fused_np/fused selects the single-pass kernel), 'aa' (active
acoustics 4x13 at reference scale; --solve ge/ge_cached/pallas).

Usage:  python scripts/profile_scan_step.py [--workload aa] [--k 20]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


NFFT = 96000
DELAYS = (887, 911, 941, 1699, 1951, 2053)


def _build_colorless(solve_method: str, cache_delays: bool):
    import jax.numpy as jnp
    import flamo_tpu
    from flamo_tpu.models import build_colorless_fdn, colorless_train_step

    flamo_tpu.set_seed(130709)
    fused_tf = solve_method == "pallas_tf"
    fused_step = solve_method in ("pallas_step", "pallas_step_np")
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
    return model, step, opt_state, inputs, targets


def _build_attenuated(solve_method: str):
    import jax.numpy as jnp
    import flamo_tpu
    from flamo_tpu.models import build_attenuated_fdn
    from flamo_tpu.models.attenuated_fdn import attenuated_train_step

    flamo_tpu.set_seed(130709)
    fused = solve_method in ("fused", "fused_np")
    model = build_attenuated_fdn(
        nfft=NFFT, delays=DELAYS,
        solve_method="pallas" if not fused else "ge_cached",
        cascade_backend="pallas" if not fused else "xla",
        cache_delays=True)
    step, opt_state = attenuated_train_step(
        model, lr=1e-4, fused_step=fused,
        step_pivot=solve_method == "fused")
    M = NFFT // 2 + 1
    inputs = jnp.zeros((1, NFFT, 1)).at[:, 0, :].set(1.0)
    targets = jnp.ones((1, M, 1))
    return model, step, opt_state, inputs, targets


def _build_aa(solve_method: str):
    import jax
    import jax.numpy as jnp
    import optax
    import flamo_tpu
    from flamo_tpu.core import masked_optimizer
    from flamo_tpu.models import build_active_acoustics

    flamo_tpu.set_seed(130297)
    model = build_active_acoustics(n_mics=4, n_loudspeakers=13,
                                   rir_length=15000, fir_order=100,
                                   nfft=NFFT, fs=48000, t60=0.5,
                                   cache_room=False,
                                   solve_method=solve_method)
    M = NFFT // 2 + 1
    inputs = jnp.zeros((1, NFFT, 13)).at[:, 0, :].set(1.0)
    targets = jnp.ones((1, M, 4))
    tx = masked_optimizer(optax.adam(1e-3), model)
    opt_state = tx.init(model)

    def step(m, o, x, t):
        def loss_fn(m):
            return jnp.mean((jnp.abs(m(x)) - t) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(m)
        up, o = tx.update(g, o, m)
        return optax.apply_updates(m, up), o, loss

    return model, step, opt_state, inputs, targets


def _build_aa_hoisted(k: int, fused: str | None = None):
    """The bench-default AA paths: 'hoisted' (frozen room response
    computed once per scan call, models.aa_hoisted_room_step) or the
    single-pass Pallas step (models.aa_fused_step, fused='fused_np' /
    'fused')."""
    import jax.numpy as jnp
    import flamo_tpu
    from flamo_tpu.models import build_active_acoustics
    from flamo_tpu.models.active_acoustics import (aa_fused_step,
                                                   aa_hoisted_room_step)

    flamo_tpu.set_seed(130297)
    model = build_active_acoustics(n_mics=4, n_loudspeakers=13,
                                   rir_length=15000, fir_order=100,
                                   nfft=NFFT, fs=48000, t60=0.5,
                                   cache_room=False,
                                   solve_method="ge_cached")
    M = NFFT // 2 + 1
    inputs = jnp.zeros((1, NFFT, 13)).at[:, 0, :].set(1.0)
    targets = jnp.ones((1, M, 4))
    if fused == "fused_tin":
        from flamo_tpu.models.active_acoustics import aa_fused_taps_step

        hmulti5, opt_state = aa_fused_taps_step(model, inputs, targets,
                                                pivot=False)

        def multi(m, o, x, t):
            return hmulti5(m, o, x, t, k)

    elif fused:
        hmulti4, opt_state, er, ei = aa_fused_step(
            model, inputs, targets, pivot=(fused == "fused"))
        er, ei = jnp.asarray(er), jnp.asarray(ei)

        def multi(m, o, x, t):
            return hmulti4(m, o, x, t, er, ei, k)

    else:
        hmulti, opt_state = aa_hoisted_room_step(model, inputs, targets)

        def multi(m, o, x, t):
            return hmulti(m, o, x, t, k)

    return model, multi, opt_state, inputs, targets


def _build_aa_evs(k: int):
    """The aa_evs_train bench workload (models.aa_evs_train_step):
    mse_evs over cycling 1601-bin partitions of F_MM, trainee U."""
    import jax.numpy as jnp
    import flamo_tpu
    from flamo_tpu.models.active_acoustics import (ActiveAcoustics,
                                                   aa_evs_train_step)

    flamo_tpu.set_seed(130297)
    M = NFFT // 2 + 1
    aa = ActiveAcoustics(n_S=1, n_M=4, n_L=13, n_A=1, nfft=NFFT,
                         FIR_order=100, rir_length=15000,
                         wgn_RT=1.0, room_t60=0.5)
    tg = jnp.full((M, 4), 0.3, dtype=jnp.float32)
    hmulti, opt_state, er, ei = aa_evs_train_step(aa, tg, lr=1e-3,
                                                  iter_num=30)
    er, ei = jnp.asarray(er), jnp.asarray(ei)

    def multi(m, o, x, t):
        return hmulti(m, o, er, ei, t, 0, k)

    inputs = jnp.zeros((1, 1, 1))  # unused; uniform (m, o, x, t) signature
    return aa.F_MM, multi, opt_state, inputs, tg


def _build_sfdn(k: int, solve_method: str):
    """The sfdn_train bench workload (masked_<m> = the masked-bin fast
    path with inner solve <m>; bare methods = the full module graph)."""
    import jax
    import jax.numpy as jnp
    import flamo_tpu
    from flamo_tpu.models import build_colorless_sfdn
    from flamo_tpu.models.scattering_fdn import (DEFAULT_SFDN_DELAYS,
                                                 sfdn_masked_train_step,
                                                 sfdn_train_step)

    flamo_tpu.set_seed(130709)
    masked = solve_method.startswith("masked_")
    model = build_colorless_sfdn(
        nfft=NFFT, delays=DEFAULT_SFDN_DELAYS,
        solve_method="ge" if masked else solve_method)
    if masked:
        step, opt_state = sfdn_masked_train_step(
            model, solve_method=solve_method[len("masked_"):])
    else:
        step, opt_state = sfdn_train_step(model)
    M = NFFT // 2 + 1
    inputs = jnp.zeros((1, M, 1)).at[:, 0, :].set(1.0)
    targets = jnp.ones((1, M, 1))

    def multi(m, o, x, t):
        def body(carry, i):
            mm, oo = carry
            mm, oo, loss = step(mm, oo, x, t, i)
            return (mm, oo), loss

        (m, o), losses = jax.lax.scan(body, (m, o), jnp.arange(k))
        return m, o, losses[-1]

    return model, multi, opt_state, inputs, targets


def capture(workload: str, solve_method: str, k: int, cache_delays: bool):
    import jax
    from flamo_tpu.utils import host_eager, to_device

    prebuilt_multi = None
    with host_eager():
        if workload == "colorless":
            built = _build_colorless(solve_method, cache_delays)
        elif workload == "attenuated":
            built = _build_attenuated(solve_method)
        elif workload == "aa":
            if solve_method in ("hoisted", "fused_np", "fused",
                                "fused_tin"):
                model, prebuilt_multi, opt_state, inputs, targets = \
                    _build_aa_hoisted(
                        k, fused=(solve_method if solve_method != "hoisted"
                                  else None))
                built = None
            else:
                built = _build_aa(solve_method)
        elif workload == "aa_evs":
            model, prebuilt_multi, opt_state, inputs, targets = \
                _build_aa_evs(k)
            built = None
        elif workload == "sfdn":
            model, prebuilt_multi, opt_state, inputs, targets = \
                _build_sfdn(k, solve_method)
            built = None
        else:
            raise SystemExit(f"unknown workload {workload!r}")
        if built is not None:
            model, step, opt_state, inputs, targets = built
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

    if prebuilt_multi is not None:
        multi = prebuilt_multi

    jmulti = jax.jit(multi, donate_argnums=(0, 1))
    model, opt_state, loss = jmulti(model, opt_state, inputs, targets)
    jax.block_until_ready(loss)

    tracedir = tempfile.mkdtemp(prefix="flamo_prof_")
    with jax.profiler.trace(tracedir, create_perfetto_trace=True):
        model, opt_state, loss = jmulti(model, opt_state, inputs, targets)
        jax.block_until_ready(loss)
    return tracedir


def load_perfetto_events(tracedir: str):
    paths = glob.glob(os.path.join(tracedir, "**", "*.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no perfetto trace under {tracedir}")
    with gzip.open(paths[0], "rt") as fh:
        trace = json.load(fh)
    return trace["traceEvents"] if isinstance(trace, dict) else trace


def device_kernel_rollup(events, k: int):
    # device-side complete events live on TPU track pids; host python
    # threads carry the jit call spans.  Identify device tracks by their
    # process name metadata.
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "tpu" in n or "Device" in n}
    rollup = {}
    total = 0.0
    nev = 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        if "step" in tname.lower():  # step-markers duplicate kernel spans
            continue
        dur = float(e.get("dur", 0.0))
        name = e.get("name", "?")
        r = rollup.setdefault(name, [0.0, 0])
        r[0] += dur
        r[1] += 1
        total += dur
        nev += 1
    print(f"device events: {nev}  total device-busy: {total:.0f} us  "
          f"=> {total / k:.1f} us/step, {nev / k:.1f} kernels/step")
    print(f"{'us/step':>9}  {'count/step':>10}  kernel")
    for name, (dur, cnt) in sorted(rollup.items(), key=lambda kv: -kv[1][0])[:40]:
        print(f"{dur / k:9.2f}  {cnt / k:10.1f}  {name[:110]}")
    return rollup, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="colorless",
                    choices=["colorless", "attenuated", "aa", "aa_evs",
                             "sfdn"])
    ap.add_argument("--solve", default=None,
                    help="colorless: pallas/pallas_tf/pallas_step[_np]/"
                         "ge*; attenuated: fused_np/fused/pallas; "
                         "aa: hoisted/ge/ge_cached/pallas")
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--cache-delays", action=argparse.BooleanOptionalAction,
                    default=True)
    args = ap.parse_args()
    if args.solve is None:
        args.solve = {"colorless": "pallas", "attenuated": "fused_np",
                      "aa": "hoisted", "aa_evs": "evs",
                      "sfdn": "masked_ge_cached"}[args.workload]
    if args.k is None:
        args.k = {"colorless": 400, "attenuated": 400, "aa": 20,
                  "aa_evs": 100, "sfdn": 100}[args.workload]
    tracedir = capture(args.workload, args.solve, args.k, args.cache_delays)
    events = load_perfetto_events(tracedir)
    device_kernel_rollup(events, args.k)
    print("trace dir:", tracedir)


if __name__ == "__main__":
    main()
