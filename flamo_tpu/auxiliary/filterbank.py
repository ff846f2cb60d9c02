"""Fractional-octave Butterworth filterbank (counterpart of reference
flamo/auxiliary/filterbank.py, adapted there from DecayFitNet).

Filters are designed with scipy at construction (host-side); application is
TPU-native: either zero-phase-free frequency-domain multiplication of the
cascaded SOS response (backend 'fft', the jittable default) or scipy
``sosfilt`` on host (backend 'scipy', bit-matching the reference's default).
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
                 nfft: int = None, backend: str = "fft"):
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
    def _band_responses(self, n_bins: int):
        from scipy.signal import sosfreqz

        freqz = np.zeros((len(self._sos), n_bins), dtype=np.complex128)
        for i, sos in enumerate(self._sos):
            _, freqz[i, :] = sosfreqz(sos, n_bins, fs=self._sample_rate)
        return freqz

    def __call__(self, x):
        return self.forward(x)

    def forward(self, x):
        """x (B, T, N) -> (B, T, N, n_bands) (fft backend) or the reference's
        scipy path stacking over dim=-2."""
        if self._backend == "scipy":
            import scipy.signal

            out = [scipy.signal.sosfilt(np.asarray(sos), np.asarray(x),
                                        axis=-1)
                   for sos in self._sos]
            return jnp.stack([jnp.asarray(o) for o in out], axis=-2)
        # fft backend: multiply band responses on the rfft grid of length T
        x = jnp.asarray(x)
        T = x.shape[1]
        n_bins = T // 2 + 1 if self._nfft is None else self._nfft
        freqz = jnp.asarray(self._band_responses(n_bins),
                            dtype=jnp.complex64)
        X = jnp.fft.rfft(x, axis=1)
        Y = jnp.einsum("bfn,kf->bfnk", X[:, :n_bins], freqz)
        return jnp.fft.irfft(Y, n=T, axis=1)

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
