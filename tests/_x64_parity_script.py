"""float64 parity vs the mounted PyTorch reference, TIGHT tolerances
(VERDICT r1 next #8).  Run as a subprocess (jax_enable_x64 is
process-global); prints X64_PARITY_OK on success.

Pins the numerically sensitive paths the reference runs in float64 by
default (examples default dtype, e0_siso.py:259-261): prod-of-rffts
biquad responses at nfft=96000, SVF tan/softplus maps, the FDN
closed-loop solve, and the alias-decay envelopes."""

import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

# stub the reference's unavailable optional deps (same as test_parity)
for name in ["soundfile", "pyfar"]:
    stub = types.ModuleType(name)
    stub.write = lambda *a, **k: None
    stub.read = lambda *a, **k: (None, None)
    sys.modules.setdefault(name, stub)
nn_audio = types.ModuleType("nnAudio")
features = types.ModuleType("nnAudio.features")
features.mel = types.SimpleNamespace(MelSpectrogram=None)
features.stft = types.SimpleNamespace(STFT=None)
nn_audio.features = features
sys.modules.setdefault("nnAudio", nn_audio)
sys.modules.setdefault("nnAudio.features", features)
sys.path.insert(0, "/root/reference")

import torch

import flamo.processor.dsp as rdsp
import flamo.processor.system as rsys
import flamo_tpu
from flamo_tpu.processor import dsp, system

FS = 48000


def close(a, b, atol, rtol, what):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (what, a.shape, b.shape)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=what)


flamo_tpu.set_seed(0)
rng = np.random.default_rng(0)

# 1. Biquad prod-of-responses at nfft=96000 (M=48001 bins, f64)
NFFT = 96000
raw = np.stack([rng.uniform(0.1, 0.4, (3, 2, 2)),
                rng.uniform(0.3, 0.9, (3, 2, 2))], axis=1)
bq = dsp.Biquad(size=(2, 2), n_sections=3, filter_type="highpass",
                nfft=NFFT, fs=FS, alias_decay_db=20.0, dtype=jnp.float64)
bq = bq.assign_value(jnp.asarray(raw))
Hj = bq.response()
bt = rdsp.Biquad(size=(2, 2), n_sections=3, filter_type="highpass",
                 nfft=NFFT, fs=FS, alias_decay_db=20.0,
                 dtype=torch.float64)
bt.assign_value(torch.tensor(raw, dtype=torch.float64))
Ht = bt.freq_response(bt.param).detach().numpy()
close(Hj, Ht, atol=1e-9, rtol=1e-7, what="biquad_response_96000_f64")

# 2. SVF tan/softplus maps (f64)
raw = rng.standard_normal((5, 2, 1, 1))
sv = dsp.SVF(size=(1, 1), n_sections=2, filter_type="peaking",
             nfft=8192, fs=FS, dtype=jnp.float64)
sv = sv.assign_value(jnp.asarray(raw))
Hj = sv.response()
st = rdsp.SVF(size=(1, 1), n_sections=2, filter_type="peaking",
              nfft=8192, fs=FS, dtype=torch.float64)
st.assign_value(torch.tensor(raw, dtype=torch.float64))
Ht = st.freq_response(st.param).detach().numpy()
# NOTE: the reference's SVF.get_poly_coeff allocates its coefficient
# buffers with torch.zeros(..., device=...) and NO dtype (reference
# dsp.py:2209-2232), silently truncating the float64 coefficient math to
# float32 — so the reference itself is only ~1e-7-accurate in f64 mode.
# Our response is full f64; the gate is therefore f32-resolution.
close(Hj, Ht, atol=1e-7, rtol=5e-7, what="svf_response_f64")

# 3. FDN closed loop (delays + orthogonal matrix through Recursion, f64)
NFFT2 = 8192
delays = np.array([89.0, 97.0, 107.0, 113.0])
W = rng.standard_normal((4, 4))
gin = rng.standard_normal((4, 1))
gout = rng.standard_normal((1, 4))

dj = dsp.parallelDelay(size=(4,), max_len=128, nfft=NFFT2, isint=True,
                       alias_decay_db=30.0, dtype=jnp.float64)
dj = dj.assign_value(dj.sample2s(jnp.asarray(delays)))
mj = dsp.Matrix(size=(4, 4), nfft=NFFT2, matrix_type="orthogonal",
                alias_decay_db=30.0, dtype=jnp.float64)
mj = mj.assign_value(jnp.asarray(W))
gj1 = dsp.Gain(size=(4, 1), nfft=NFFT2, alias_decay_db=30.0,
               dtype=jnp.float64).assign_value(jnp.asarray(gin))
gj2 = dsp.Gain(size=(1, 4), nfft=NFFT2, alias_decay_db=30.0,
               dtype=jnp.float64).assign_value(jnp.asarray(gout))
rec = system.Recursion(fF=dj, fB=mj)
shell = system.Shell(core=system.Series(gj1, rec, gj2),
                     input_layer=dsp.FFT(NFFT2, dtype=jnp.float64),
                     output_layer=dsp.iFFT(NFFT2, dtype=jnp.float64))
yj = shell.get_time_response(fs=FS)

dt = rdsp.parallelDelay(size=(4,), max_len=128, nfft=NFFT2, isint=True,
                        alias_decay_db=30.0, dtype=torch.float64)
dt.assign_value(dt.sample2s(torch.tensor(delays, dtype=torch.float64)))
mt = rdsp.Matrix(size=(4, 4), nfft=NFFT2, matrix_type="orthogonal",
                 alias_decay_db=30.0, dtype=torch.float64)
mt.assign_value(torch.tensor(W, dtype=torch.float64))
gt1 = rdsp.Gain(size=(4, 1), nfft=NFFT2, alias_decay_db=30.0,
                dtype=torch.float64)
gt1.assign_value(torch.tensor(gin, dtype=torch.float64))
gt2 = rdsp.Gain(size=(1, 4), nfft=NFFT2, alias_decay_db=30.0,
                dtype=torch.float64)
gt2.assign_value(torch.tensor(gout, dtype=torch.float64))
rect = rsys.Recursion(fF=dt, fB=mt)
shellt = rsys.Shell(core=torch.nn.Sequential(gt1, rect, gt2),
                    input_layer=rdsp.FFT(NFFT2, dtype=torch.float64),
                    output_layer=rdsp.iFFT(NFFT2, dtype=torch.float64))
yt = shellt.get_time_response(fs=FS).detach().numpy()
# the orthogonal map (ours: Taylor scaling-and-squaring expm; torch:
# Pade matrix_exp) agrees to ~1e-9 in f64; the loop solve amplifies near
# resonances, so the IR gate is 1e-6 absolute on an O(1) signal
close(yj, yt, atol=1e-6, rtol=1e-4, what="fdn_closed_loop_ir_f64")

# 4. alias envelopes: FFTAntiAlias / iFFTAntiAlias transforms (f64)
x = rng.standard_normal((1, 4096, 2))
fa_j = dsp.FFTAntiAlias(nfft=4096, alias_decay_db=30.0, dtype=jnp.float64)
fa_t = rdsp.FFTAntiAlias(nfft=4096, alias_decay_db=30.0,
                         dtype=torch.float64)
close(fa_j(jnp.asarray(x)),
      fa_t(torch.tensor(x, dtype=torch.float64)).detach().numpy(),
      atol=1e-11, rtol=1e-9, what="fft_antialias_f64")

print("X64_PARITY_OK")
