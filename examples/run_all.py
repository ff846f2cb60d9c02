"""Smoke-run every example headlessly (reference examples/run_all.py)."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
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
