"""Smoke-run every example headlessly (reference examples/run_all.py).

``--full`` instead runs the four realistic reference workloads at the
REFERENCE's shapes (the colorless flagship, the scattering FDN and
e8_fdn at nfft=96000; active acoustics at 4 mics x 13 loudspeakers,
RIR 15000, FIR order 100, nfft=96000) on the default device (intended:
the TPU) and reports
wall-clock — the end-to-end gate that the framework holds up beyond the
bench's isolated step timings.  Each example's own assertions (finite +
decreasing losses, finite GBI/eigenvalues) are the pass criteria."""

import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

# (script, extra CLI args) at the reference's workload shapes.  The
# jobs run their gated fast paths by default (colorless: the fused
# no-pivot step kernel; e8_fdn: fused Pallas cascade+solve kernels +
# whole-epoch scan; active acoustics: the fused lanes-major evs
# training step; scattering FDN: the generic solve ladder — its
# (M, N, N) frequency-dependent loop has no fused kernel) and fall
# back to the XLA graph paths if the parity gates fail on the
# attached backend.
FULL_JOBS = [
    ("e8_colorless_fdn.py",
     ["--nfft", "96000", "--max_epochs", "5", "--num", "32",
      "--batch_size", "1"]),
    ("e8_colorless_sfdn.py",
     ["--nfft", "96000", "--max_epochs", "3", "--num", "24",
      "--batch_size", "1"]),
    ("e8_fdn.py",
     ["--nfft", "96000", "--scenario", "fdn", "--max_epochs", "3",
      "--num", "8", "--batch_size", "1"]),
    ("e8_active_acoustics.py",
     ["--nfft", "96000", "--mics", "4", "--loudspeakers", "13",
      "--fir_order", "100", "--rir_length", "15000", "--wgn_rt", "1.0",
      "--room_t60", "0.5", "--max_epochs", "2", "--num", "8",
      "--batch_size", "1"]),
]


def run_full():
    failures = []
    env = dict(os.environ, MPLBACKEND="Agg")
    for script, extra in FULL_JOBS:
        print(f"### {script} (reference scale)")
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, script),
             "--train_dir", f"/tmp/flamo_tpu_examples_full/{script[:-3]}"]
            + extra,
            env=env, capture_output=True, text=True, timeout=3600)
        dt = time.time() - t0
        if proc.returncode != 0:
            failures.append(script)
            print(proc.stderr[-3000:])
        else:
            tail = [l for l in proc.stdout.strip().splitlines()
                    if "loss" in l.lower()]
            print("\n".join(tail[-4:]))
            print(f"ok in {dt:.1f}s")
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print(f"all {len(FULL_JOBS)} reference-scale workloads passed")


def main():
    if "--full" in sys.argv:
        run_full()
        return
    failures = []
    scripts = sorted(f for f in os.listdir(HERE)
                     if f.startswith("e") and f.endswith(".py"))
    env = dict(os.environ, MPLBACKEND="Agg")
    for script in scripts:
        print(f"### {script}")
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, script), "--device", "cpu",
             "--max_epochs", "2", "--num", "8", "--batch_size", "2",
             "--train_dir", f"/tmp/flamo_tpu_examples/{script[:-3]}"],
            env=env, capture_output=True, text=True, timeout=900)
        if proc.returncode != 0:
            failures.append(script)
            print(proc.stderr[-2000:])
        else:
            print("ok")
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print(f"all {len(scripts)} examples passed")


if __name__ == "__main__":
    main()
