"""Minimal faithful reconstruction of the two nnAudio modules the
reference's perceptual losses use (nnAudio is not installable in this
image) — so the REFERENCE'S OWN loss code (/root/reference/flamo/optimize/
loss.py:169-459, 553-670) can execute here and serve as the parity
oracle for flamo_tpu.optimize.loss.

Reconstructed conventions (nnAudio 0.3.x, Spectrogram.py):

* ``features.stft.STFT(freq_scale='linear', fmin, fmax)`` — DFT kernels
  at ``freq_bins = n_fft//2+1`` NON-INTEGER bin positions linearly
  respaced between fmin and fmax: ``bin_k = start_bin + k*scaling`` with
  ``start_bin = fmin*n_fft/sr`` and ``scaling = (fmax-fmin)*(n_fft/sr)/
  freq_bins`` — NOT the standard rfft grid (bin 0 sits at fmin, the top
  bin just below fmax).  Window: periodic Hann over win_length, padded
  centered to n_fft.  center=True pads reflect by n_fft//2.
  output_format='Magnitude' -> sqrt(re^2 + im^2).
* ``features.mel.MelSpectrogram`` — standard-grid POWER spectrogram
  (|STFT|^2, same centering/window rules) through
  ``librosa.filters.mel``'s bank: SLANEY mel scale (linear below 1 kHz,
  log above), triangular weights on the rfft bin grid, 'slaney' area
  normalization ``2/(f[k+2]-f[k])``.
"""

from __future__ import annotations

import numpy as np
import torch


def _hann_periodic(n):
    return torch.hann_window(n, periodic=True, dtype=torch.float64)


def _frame(x, n_fft, hop, center):
    if center:
        x = torch.nn.functional.pad(x, (n_fft // 2, n_fft // 2),
                                    mode="reflect")
    n_frames = 1 + (x.shape[-1] - n_fft) // hop
    idx = (torch.arange(n_fft)[None, :]
           + hop * torch.arange(n_frames)[:, None])
    return x[:, idx]  # (B, n_frames, n_fft)


class STFT(torch.nn.Module):
    def __init__(self, n_fft, hop_length=None, win_length=None,
                 window="hann", freq_scale="no", sr=22050, fmin=50,
                 fmax=6000, output_format="Magnitude", center=True,
                 verbose=False, **kwargs):
        super().__init__()
        assert window == "hann" and output_format == "Magnitude"
        self.n_fft = n_fft
        self.hop_length = hop_length or n_fft // 4
        self.center = center
        win_length = win_length or n_fft
        freq_bins = n_fft // 2 + 1
        s = np.arange(n_fft)
        if freq_scale == "linear":
            start_bin = fmin * n_fft / sr
            scaling = (fmax - fmin) * (n_fft / sr) / freq_bins
            bins = start_bin + scaling * np.arange(freq_bins)
        elif freq_scale == "no":
            bins = np.arange(freq_bins).astype(np.float64)
        else:
            raise NotImplementedError(freq_scale)
        win = _hann_periodic(win_length).numpy()
        if win_length < n_fft:
            pad = (n_fft - win_length) // 2
            win = np.pad(win, (pad, n_fft - win_length - pad))
        ang = 2 * np.pi * bins[:, None] * s[None, :] / n_fft
        self.register_buffer(
            "wcos", torch.tensor(np.cos(ang) * win[None, :]))
        self.register_buffer(
            "wsin", torch.tensor(np.sin(ang) * win[None, :]))

    def forward(self, x):
        x = x.to(self.wcos.dtype)
        frames = _frame(x, self.n_fft, self.hop_length, self.center)
        re = torch.einsum("btn,fn->bft", frames, self.wcos)
        im = torch.einsum("btn,fn->bft", frames, self.wsin)
        return torch.sqrt(re ** 2 + im ** 2)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10)
                                         / min_log_hz) / logstep,
                    mels)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    f_sp * m)


def librosa_mel_bank(sr, n_fft, n_mels, fmin, fmax):
    """librosa.filters.mel with htk=False, norm='slaney'."""
    n_bins = n_fft // 2 + 1
    fftfreqs = np.linspace(0, sr / 2, n_bins)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax),
                          n_mels + 2)
    mel_f = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    weights = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
    return weights * enorm[:, None]


class MelSpectrogram(torch.nn.Module):
    def __init__(self, n_fft, hop_length=None, win_length=None,
                 window="hann", sr=22050, fmin=0.0, fmax=None, n_mels=128,
                 power=2.0, center=True, verbose=False, **kwargs):
        super().__init__()
        assert window == "hann"
        self.stft = STFT(n_fft=n_fft, hop_length=hop_length,
                         win_length=win_length, window=window,
                         freq_scale="no", sr=sr,
                         output_format="Magnitude", center=center)
        self.power = power
        fmax = fmax or sr / 2
        self.register_buffer("mel_basis", torch.tensor(
            librosa_mel_bank(sr, n_fft, n_mels, fmin, fmax)))

    def forward(self, x):
        S = self.stft(x) ** self.power
        return torch.einsum("mf,bft->bmt", self.mel_basis, S)


def install(sys_modules):
    """Register this shim as the ``nnAudio`` package in sys.modules."""
    import types

    nn_audio = types.ModuleType("nnAudio")
    features = types.ModuleType("nnAudio.features")
    features.stft = types.SimpleNamespace(STFT=STFT)
    features.mel = types.SimpleNamespace(MelSpectrogram=MelSpectrogram)
    nn_audio.features = features
    sys_modules["nnAudio"] = nn_audio
    sys_modules["nnAudio.features"] = features
