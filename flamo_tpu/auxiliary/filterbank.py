"""Fractional-octave Butterworth filterbank (counterpart of reference
flamo/auxiliary/filterbank.py, adapted there from DecayFitNet).

Filters are designed with scipy at construction (host-side); application is
TPU-native: frequency-domain multiplication of the cascaded SOS response
(backend 'fft', the jittable default) or scipy ``sosfilt`` on host
(backend 'scipy').  Both backends share ONE output convention —
``(B, T, N) -> (B, T, N, n_bands)``, causal filtering along time — and the
'fft' backend gets LINEAR convolution semantics by zero-padding the
signal past the filters' decay (``pad`` samples) and sampling the band
responses on the exact rfft grid.  (The reference's own forward is
partially dead code — its backend if/else raises for 'scipy'
(filterbank.py:250-260) and its 'torch' path multiplies circularly on the
unpadded grid; the behavioral contract implemented here is causal
band-filtering along time with a bounded fft-vs-scipy error, see
tests/test_aux.py.)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_NOM_FREQ_F1 = [16, 31.5, 63, 125, 250, 500, 1000, 2000, 4000, 8000, 16000,
                32000]
_NOM_FREQ_F3 = [16, 20, 25, 31.5, 40, 50, 63, 80, 100, 125, 160, 200, 250,
                315, 400, 500, 630, 800, 1000, 1250, 1600, 2000, 2500, 3150,
                4000, 5000, 6300, 8000, 10000, 12500, 16000, 20000, 25000,
                32000]


class FilterBank:
    """Octave / third-octave Butterworth filterbank
    (reference filterbank.py:12-325)."""

    def __init__(self, fraction: int = 3, order: int = 5, fmin: float = 20.0,
                 fmax: float = 18000.0, sample_rate: int = 48000,
                 nfft: int = None, backend: str = "fft",
                 pad: int = None):
        assert fraction in (1, 3), (
            "At the moment only fractions 1 and 3 are supported"
        )
        nom = _NOM_FREQ_F1 if fraction == 1 else _NOM_FREQ_F3
        index = [0, len(nom)]
        for i, f in enumerate(nom):
            if fmin > f:
                index[0] = i + (1 if fraction == 3 else 0)
                break
        for i, f in enumerate(nom):
            if f > fmax:
                index[1] = i
                break
        self._center_frequencies = nom[index[0]:index[1]]
        self._order = order
        self._sample_rate = sample_rate
        self._backend = backend
        self._nfft = nfft
        # zero-padding for linear-convolution semantics on the fft
        # backend: 1 s covers the narrow low bands' decay to < -60 dB
        self._pad = sample_rate if pad is None else int(pad)
        self._sos = self._get_octave_filters(
            self._center_frequencies, sample_rate, order)

    # -- setters (rebuild filters, reference filterbank.py:185-225) --------
    def set_sample_rate(self, sample_rate):
        self._sample_rate = sample_rate
        self._sos = self._get_octave_filters(
            self._center_frequencies, sample_rate, self._order)

    def set_order(self, order):
        self._order = order
        self._sos = self._get_octave_filters(
            self._center_frequencies, self._sample_rate, order)

    def set_center_frequencies(self, center_freqs):
        cf = np.asarray(center_freqs)
        assert not np.any(cf < 0) and not np.any(cf > self._sample_rate / 2), (
            "Center Frequencies must be greater than 0 and smaller than fs/2. "
            "Exceptions: exactly 0 or fs/2 will give lowpass or highpass bands"
        )
        self._center_frequencies = np.sort(cf).tolist()
        self._sos = self._get_octave_filters(
            self._center_frequencies, self._sample_rate, self._order)

    def get_center_frequencies(self):
        return self._center_frequencies

    # -- application -------------------------------------------------------
    def _band_responses(self, nfft_pad: int):
        """Band responses sampled on the EXACT rfft grid of an
        ``nfft_pad``-point transform (k * fs / nfft_pad), so the fft
        backend's multiplication is the true DFT of each filter."""
        from scipy.signal import sosfreqz

        worN = np.fft.rfftfreq(nfft_pad, d=1.0 / self._sample_rate)
        freqz = np.zeros((len(self._sos), worN.shape[0]),
                         dtype=np.complex128)
        for i, sos in enumerate(self._sos):
            _, freqz[i, :] = sosfreqz(sos, worN=worN, fs=self._sample_rate)
        return freqz

    def __call__(self, x):
        return self.forward(x)

    def forward(self, x):
        """x (B, T, N) -> (B, T, N, n_bands), causal band filtering along
        the time axis (both backends share this convention)."""
        if self._backend == "scipy":
            import scipy.signal

            out = [scipy.signal.sosfilt(np.asarray(sos), np.asarray(x),
                                        axis=1)
                   for sos in self._sos]
            return jnp.stack([jnp.asarray(o) for o in out], axis=-1)
        # fft backend: zero-pad past the filter decay (linear, not
        # circular, convolution) and multiply the exact-grid responses
        x = jnp.asarray(x)
        T = x.shape[1]
        Tp = T + self._pad
        freqz = jnp.asarray(self._band_responses(Tp), dtype=jnp.complex64)
        X = jnp.fft.rfft(x, n=Tp, axis=1)
        Y = jnp.einsum("bfn,kf->bfnk", X, freqz)
        return jnp.fft.irfft(Y, n=Tp, axis=1)[:, :T]

    def get_filterbank_impulse_response(self):
        """Impulse response of the bank (reference filterbank.py:263-273)."""
        impulse = jnp.zeros((1, self._sample_rate * 20, 1))
        impulse = impulse.at[0, self._sample_rate, 0].set(1.0)
        return self.forward(impulse)

    @staticmethod
    def _get_octave_filters(center_freqs, fs, order):
        """Butterworth SOS per band (reference filterbank.py:275-325)."""
        from scipy.signal import butter

        sos = []
        for band_idx in range(len(center_freqs)):
            center_freq = center_freqs[band_idx]
            if abs(center_freq) < 1e-6:
                f_cutoff = (1 / np.sqrt(2)) * center_freqs[band_idx + 1]
                this_sos = butter(N=order, Wn=f_cutoff, fs=fs, btype="lowpass",
                                  analog=False, output="sos")
            elif abs(center_freq - fs / 2) < 1e-6:
                f_cutoff = np.sqrt(2) * center_freqs[band_idx - 1]
                this_sos = butter(N=order, Wn=f_cutoff, fs=fs,
                                  btype="highpass", analog=False, output="sos")
            else:
                f_cutoff = center_freq * np.array([1 / np.sqrt(2),
                                                   np.sqrt(2)])
                this_sos = butter(N=order, Wn=f_cutoff, fs=fs,
                                  btype="bandpass", analog=False, output="sos")
            sos.append(this_sos)
        return sos
