"""float64 mode (the reference's CPU examples default to float64,
e0_siso.py:259-261).  Runs in a subprocess because jax_enable_x64 is a
process-global flag."""

import subprocess
import sys

import pytest

_SCRIPT = """
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
import flamo_tpu
from flamo_tpu.models import build_colorless_fdn
from flamo_tpu.processor import dsp

flamo_tpu.set_seed(0)
m = build_colorless_fdn(nfft=1024, delays=(13, 17, 19, 23, 29, 31),
                        dtype=jnp.float64)
x = jnp.zeros((1, 1024, 1), dtype=jnp.float64).at[:, 0, :].set(1.0)
y = jax.jit(lambda m, x: m(x))(m, x)
assert y.dtype == jnp.float64, y.dtype

for mod, kw in [
    (dsp.Biquad, dict(size=(1, 1), n_sections=2, filter_type='lowpass')),
    (dsp.SVF, dict(size=(1, 1), n_sections=1, filter_type='peaking')),
    (dsp.GEQ, dict(size=(1, 1), octave_interval=1)),
]:
    H = mod(nfft=1024, fs=48000, dtype=jnp.float64, **kw).response()
    assert H.dtype == jnp.complex128, (mod.__name__, H.dtype)
print('X64_OK')
"""


def test_x64_mode_subprocess():
    proc = subprocess.run([sys.executable, "-c", _SCRIPT],
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "X64_OK" in proc.stdout


def test_x64_parity_vs_reference_subprocess():
    """f64 parity matrix vs the PyTorch reference with tight tolerances
    (VERDICT r1 next #8): biquad prod-of-responses at nfft=96000, SVF tan
    maps, FDN closed-loop IR, anti-alias envelopes."""
    import os

    script = os.path.join(os.path.dirname(__file__),
                          "_x64_parity_script.py")
    proc = subprocess.run([sys.executable, script],
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "X64_PARITY_OK" in proc.stdout
