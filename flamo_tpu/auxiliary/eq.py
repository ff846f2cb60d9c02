"""Graphic-EQ design helpers (counterpart of reference flamo/auxiliary/eq.py).

:func:`geq` is fully vectorized/jittable (the reference builds bands in a
Python loop).  :func:`accurate_geq` keeps the Schlecht-Habets accurate design
but replaces the reference's inner torch-LBFGS loop (eq.py:114-182) with a
host-side bounded linear least squares (``scipy.optimize.lsq_linear``) — the
problem *is* linear in the command gains, so this is exact, deterministic,
and runs once at module construction instead of on every forward.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from flamo_tpu.functional import db2mag, peak_filter, shelving_filter


def octave_bands(interval: int = 1, start_freq: float = 31.25,
                 end_freq: float = 16000.0):
    """Octave-band center frequencies (reference eq.py:34-54)."""
    central_freq = []
    c_freq = start_freq
    while c_freq < end_freq:
        central_freq.append(c_freq * np.power(2, 1 / interval))
        c_freq = central_freq[-1]
    return central_freq


def eq_freqs(interval: int = 1, start_freq: float = 31.25,
             end_freq: float = 16000.0, dtype=jnp.float32):
    """Center + shelving crossover frequencies (reference eq.py:8-31)."""
    center_freq = jnp.asarray(
        octave_bands(interval=interval, start_freq=start_freq,
                     end_freq=end_freq), dtype=dtype)
    shelving_crossover = jnp.asarray([
        float(center_freq[0]) / np.power(2, 1 / interval / 2),
        float(center_freq[-1]) * np.power(2, 1 / interval / 2),
    ], dtype=dtype)
    return center_freq, shelving_crossover


def geq(center_freq, shelving_freq, R, gain_db, fs: int = 48000,
        dtype=jnp.float32):
    """GEQ as SOS cascade: DC gain + low shelf + peaks + high shelf
    (reference eq.py:57-111).

    gain_db: (num_bands,) with num_bands = len(center)+len(shelving)+1.
    Returns (b, a), each (3, num_bands).  Jittable: all bands are built
    branch-free and concatenated."""
    center_freq = jnp.asarray(center_freq, dtype=dtype)
    shelving_freq = jnp.asarray(shelving_freq, dtype=dtype)
    gain_db = jnp.asarray(gain_db, dtype=dtype)
    num_bands = center_freq.shape[0] + shelving_freq.shape[0] + 1
    assert gain_db.shape[0] == num_bands, (
        "The number of gains must be equal to the number of frequencies."
    )
    # band 0: pure gain
    g0 = db2mag(gain_db[0])
    b0 = jnp.stack([g0, jnp.zeros_like(g0), jnp.zeros_like(g0)])[:, None]
    a0 = jnp.asarray([1.0, 0.0, 0.0], dtype=dtype)[:, None]
    # band 1: low shelf
    b_ls, a_ls = shelving_filter(shelving_freq[0], db2mag(gain_db[1]),
                                 "low", fs=fs, dtype=dtype)
    # last band: high shelf
    b_hs, a_hs = shelving_filter(shelving_freq[1], db2mag(gain_db[-1]),
                                 "high", fs=fs, dtype=dtype)
    # middle bands: peaks, vectorized over center frequencies
    R = jnp.asarray(R, dtype=dtype)
    Q = jnp.sqrt(R) / (R - 1)
    b_pk, a_pk = peak_filter(center_freq, db2mag(gain_db[2:-1]), Q,
                             fs=fs, dtype=dtype)  # (3, n_center)
    b = jnp.concatenate([b0, b_ls[:, None], b_pk, b_hs[:, None]], axis=1)
    a = jnp.concatenate([a0, a_ls[:, None], a_pk, a_hs[:, None]], axis=1)
    return b, a


def accurate_geq(target_gain, center_freq, shelving_crossover, fs: int = 48000,
                 dtype=jnp.float32):
    """Accurate GEQ design (reference eq.py:114-182; Schlecht & Habets 2017).

    target_gain: (len(center_freq)+2,) dB values.  Builds a 10 dB prototype
    bank, probes its magnitude at 100 log-spaced control frequencies,
    interpolates the target, and solves the bounded least-squares fit for
    the command gains — exactly (scipy lsq_linear) instead of 100 LBFGS
    iterations.  Host-side numpy (design time only).

    Returns (b, a) each (3, len(center_freq)+3)."""
    from scipy.optimize import lsq_linear

    target_gain = np.asarray(target_gain, dtype=np.float64)
    center_freq = np.asarray(center_freq, dtype=np.float64)
    shelving_crossover = np.asarray(shelving_crossover, dtype=np.float64)
    assert len(target_gain) == len(center_freq) + 2, (
        "The number of target gains must be equal to the number of center "
        "frequencies + 2."
    )
    nfft = 2 ** 16
    num_freq = len(center_freq) + len(shelving_crossover)
    R = 2.7
    num_control = 100
    control_freq = np.round(
        np.logspace(np.log10(1), np.log10(fs / 2.1), num_control + 1))
    target_freq = np.concatenate(([1.0], center_freq, [fs / 2.1]))
    targetInterp = np.interp(control_freq, target_freq, target_gain)

    # 10 dB prototype bank probed at the control frequencies
    prototype_gain = 10.0
    proto_gains = np.full((num_freq + 1,), prototype_gain)
    b, a = geq(center_freq, shelving_crossover, R, proto_gains, fs,
               dtype=jnp.float64)
    b = np.asarray(b)
    a = np.asarray(a)
    # normalized magnitude response of each band at the control freqs
    sos = np.vstack([b, a])  # (6, num_bands)
    sos = sos / sos[3:4, :]
    w = 2 * np.pi * np.arange(nfft // 2 + 1) / nfft
    z = np.exp(-1j * w)[:, None]
    B = sos[0] + sos[1] * z + sos[2] * z * z
    A = sos[3] + sos[4] * z + sos[5] * z * z
    H = B / (A + 1e-10)
    f = np.fft.rfftfreq(nfft, 1.0 / fs)
    mag_db = 20 * np.log10(np.abs(H))
    G = np.stack([np.interp(control_freq, f, mag_db[:, band])
                  for band in range(mag_db.shape[1])], axis=1)
    G = G / prototype_gain

    upper = np.array([np.inf] + [2 * prototype_gain] * num_freq)
    res = lsq_linear(G, targetInterp, bounds=(-upper, upper))
    opt_gains = res.x

    b, a = geq(center_freq, shelving_crossover, R, jnp.asarray(opt_gains),
               fs, dtype=dtype)
    return b, a
