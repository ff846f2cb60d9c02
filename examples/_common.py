"""Shared CLI plumbing for the examples (mirrors the reference's common
argparse vocabulary, e.g. examples/e0_siso.py:254-318)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def example_parser(**overrides):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nfft", type=int, default=overrides.get("nfft", 96000))
    ap.add_argument("--samplerate", type=int,
                    default=overrides.get("samplerate", 48000))
    ap.add_argument("--device", type=str, default=None,
                    help="'cpu' forces the CPU backend; default lets JAX pick")
    ap.add_argument("--batch_size", type=int,
                    default=overrides.get("batch_size", 1))
    ap.add_argument("--num", type=int, default=overrides.get("num", 64),
                    help="dataset expansion length")
    ap.add_argument("--split", type=float, default=0.8)
    ap.add_argument("--max_epochs", type=int,
                    default=overrides.get("max_epochs", 3))
    ap.add_argument("--lr", type=float, default=overrides.get("lr", 1e-3))
    ap.add_argument("--train_dir", type=str, default=None)
    ap.add_argument("--patience_delta", type=float, default=1e-5)
    ap.add_argument("--seed", type=int, default=overrides.get("seed", 130709))
    ap.add_argument("--dtype", type=str, default="float32",
                    choices=["float32", "float64"],
                    help="float64 enables x64 mode (reference examples "
                         "default to float64 on CPU; TPU is float32-native)")
    return ap


def setup(args):
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.dtype == "float64":
        from flamo_tpu.utils import enable_x64

        enable_x64()
    import flamo_tpu

    flamo_tpu.set_seed(args.seed)
    if args.train_dir is None:
        args.train_dir = os.path.join(
            "output", time.strftime("%Y%m%d-%H%M%S"))
    os.makedirs(args.train_dir, exist_ok=True)
    with open(os.path.join(args.train_dir, "args.txt"), "w") as f:
        f.write("\n".join(f"{k}: {v}" for k, v in vars(args).items()))
    return args
