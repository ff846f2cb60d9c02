"""WAV IO: true 24-bit PCM write/read (reference flamo/utils.py:25-30
writes PCM_24 via soundfile; flamo_tpu.utils.save_audio writes the same
3-byte frames via the stdlib wave module)."""

import wave

import numpy as np

from flamo_tpu.utils import load_audio, save_audio


def test_pcm24_is_three_bytes_per_sample(tmp_path):
    fs = 48000
    t = np.arange(1024) / fs
    x = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                  -0.25 * np.cos(2 * np.pi * 220 * t)], axis=1)
    path = str(tmp_path / "sine24.wav")
    save_audio(path, x, fs=fs, subtype="PCM_24")
    with wave.open(path, "rb") as w:
        assert w.getsampwidth() == 3  # honest PCM_24, not an int32 container
        assert w.getnchannels() == 2
        assert w.getframerate() == fs
        assert w.getnframes() == 1024


def test_pcm24_roundtrip(tmp_path):
    fs = 16000
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.0, 1.0, size=(512, 1)).astype(np.float64)
    path = str(tmp_path / "noise24.wav")
    save_audio(path, x, fs=fs, subtype="PCM_24")
    y, fs2 = load_audio(path)
    assert fs2 == fs
    assert y.shape == (512, 1)
    # 24-bit quantization: one LSB = 2^-23
    assert np.max(np.abs(y - x)) < 2.0 ** -22


def test_pcm16_and_float_still_roundtrip(tmp_path):
    fs = 8000
    x = np.linspace(-0.9, 0.9, 256)[:, None]
    p16 = str(tmp_path / "a16.wav")
    save_audio(p16, x, fs=fs, subtype="PCM_16")
    y16, _ = load_audio(p16)
    assert np.max(np.abs(y16 - x)) < 2.0 ** -14
    pf = str(tmp_path / "af.wav")
    save_audio(pf, x, fs=fs, subtype="FLOAT")
    yf, _ = load_audio(pf)
    assert np.max(np.abs(yf - x)) < 1e-6
