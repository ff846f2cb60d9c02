"""Minimal reconstruction of the pyfar surface the reference's edc_loss
uses (pyfar is not installable in this image): ``pf.Signal`` and
``pf.dsp.filter.fractional_octave_bands`` — so the REFERENCE'S OWN edc
code (/root/reference/flamo/optimize/loss.py:716-738) can execute here
as the parity oracle.

Reconstructed conventions (pyfar 0.6.x):

* band frequencies per IEC 61260-1:2014: exact centers
  ``1000 * G**(m/num_fractions)`` with ``G = 10**(3/10)``, kept while
  inside ``frequency_range``; cutoffs ``f_c * G**(+-1/(2*num_fractions))``.
* filters: ``scipy.signal.butter(order, [lo, hi], 'bandpass', sos)``
  with pyfar's default ``order=14``, applied causally (``sosfilt``).
* ``Signal.freq``: plain one-sided ``rfft`` (pyfar fft_norm='none').
"""

from __future__ import annotations

import types

import numpy as np
import scipy.signal as sps


class Signal:
    def __init__(self, data, fs):
        self.data = np.atleast_2d(np.asarray(data, dtype=np.float64))
        self.fs = fs

    @property
    def freq(self):
        return np.fft.rfft(self.data, axis=-1)


def fractional_octave_frequencies(num_fractions, frequency_range):
    G = 10.0 ** (3.0 / 10.0)
    lo, hi = frequency_range
    ms = np.arange(-60, 61)
    centers = 1000.0 * G ** (ms / num_fractions)
    keep = (centers >= lo / G ** (1 / (2 * num_fractions))) & (
        centers <= hi * G ** (1 / (2 * num_fractions)))
    centers = centers[keep]
    centers = centers[(centers >= lo * 0.95) & (centers <= hi * 1.05)]
    cut_lo = centers * G ** (-1 / (2 * num_fractions))
    cut_hi = centers * G ** (1 / (2 * num_fractions))
    return centers, (cut_lo, cut_hi)


def fractional_octave_bands(signal, num_fractions,
                            frequency_range=(20, 20000), order=14):
    fs = signal.fs
    centers, (cut_lo, cut_hi) = fractional_octave_frequencies(
        num_fractions, frequency_range)
    outs = []
    for lo, hi in zip(cut_lo, cut_hi):
        hi = min(hi, 0.999 * fs / 2)
        sos = sps.butter(order, [lo, hi], btype="bandpass", output="sos",
                         fs=fs)
        outs.append(sps.sosfilt(sos, signal.data, axis=-1))
    out = Signal(np.stack(outs).reshape(len(outs), -1), fs)
    return out


def install(sys_modules):
    """Register this shim as the ``pyfar`` package in sys.modules."""
    pf = types.ModuleType("pyfar")
    pf.Signal = Signal
    dsp = types.ModuleType("pyfar.dsp")
    filt = types.ModuleType("pyfar.dsp.filter")
    filt.fractional_octave_bands = fractional_octave_bands
    filt.fractional_octave_frequencies = fractional_octave_frequencies
    dsp.filter = filt
    pf.dsp = dsp
    sys_modules["pyfar"] = pf
    sys_modules["pyfar.dsp"] = dsp
    sys_modules["pyfar.dsp.filter"] = filt
