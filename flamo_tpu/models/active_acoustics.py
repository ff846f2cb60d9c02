"""Active Acoustics model family (reference examples/e8_active_acoustics.py,
Dal Santo et al. DAFx-24): a MIMO electroacoustic feedback loop — physical
room responses around a trainable mixing-filter matrix — optimized for a
flat loop response, with gain-before-instability (GBI) analysis.

The reference binds this workload to measured RIR matrices; here the room
is pluggable: measured IRs, or synthetic WGN-reverb rooms for
reproducibility.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from flamo_tpu.functional import WGN_reverb, get_eigenvalues, spectral_radius
from flamo_tpu.processor import dsp, system
from flamo_tpu.utils import next_key


def build_active_acoustics(n_mics: int = 4, n_loudspeakers: int = 13,
                           rir_length: int = 15000, fir_order: int = 100,
                           nfft: int = 96000, fs: int = 48000,
                           room_irs=None, t60: float = 0.5,
                           alias_decay_db: float = 0.0,
                           cache_room: bool = True, key=None):
    """Shell(FFT -> Recursion(room, mixing FIR) -> identity).

    room_irs: (rir_length, n_mics, n_loudspeakers) measured IR matrix, or
    None for a synthetic WGN-reverb room.  The mixing FIR
    (n_loudspeakers x n_mics, fir_order taps) is the trainable DSP
    (reference e8_active_acoustics.py:505-560, 671-676)."""
    key = next_key(key)
    k_room, k_mix = jax.random.split(key)
    if room_irs is None:
        room_irs = WGN_reverb((n_mics, n_loudspeakers), t60=t60,
                              samplerate=fs, key=k_room)[:rir_length]
    room_irs = jnp.asarray(room_irs)
    rir_length = room_irs.shape[0]

    room = dsp.Filter(size=(rir_length, n_mics, n_loudspeakers), nfft=nfft,
                      requires_grad=False, alias_decay_db=alias_decay_db)
    room = room.assign_value(room_irs)
    if cache_room:
        # the room is frozen: precompute its (M, mics, lds) response once
        # instead of re-rffting 15000-tap IRs inside every training step
        room = dsp.CachedResponse(room)

    mixer = dsp.Filter(size=(fir_order, n_loudspeakers, n_mics), nfft=nfft,
                       requires_grad=True, alias_decay_db=alias_decay_db,
                       key=k_mix)
    # small init: keep the loop stable at the start
    mixer = mixer.replace(param=mixer.param * 0.01)

    loop = system.Recursion(fF=room, fB=mixer)
    shell = system.Shell(core=loop, input_layer=dsp.FFT(nfft))
    return shell


def open_loop_matrix(model: system.Shell, subsample: int = 32):
    """Open-loop matrix G(z) = mixer(room) materialized per bin, shape
    (M//subsample, n_lds, n_lds)."""
    loop = model.get_core()
    room, mixer = loop.feedforward, loop.feedback
    rR = room.matrix_response()
    rM = mixer.matrix_response()
    from flamo_tpu.ops import linop

    kind, G = linop.compose(rM[0], rM[1], rR[0], rR[1])
    M = room.M
    Gm = linop.materialize(kind, G, M, mixer.output_channels,
                           room.input_channels)
    return Gm[::subsample]


def open_loop_eigenvalues(model: system.Shell, subsample: int = 32):
    """Eigenvalues of the open-loop matrix G(z) = mixer(room) over a bin
    subsample (reference e8_active_acoustics.py:183-215).  Host-callback
    eig — analysis only."""
    return get_eigenvalues(open_loop_matrix(model, subsample))


def gain_before_instability(model: system.Shell, subsample: int = 32):
    """GBI in dB: how much broadband gain fits before |eig| reaches 1."""
    evs = open_loop_eigenvalues(model, subsample)
    max_ev = jnp.max(jnp.abs(evs))
    return -20 * jnp.log10(max_ev)


def gain_before_instability_diff(model: system.Shell, subsample: int = 32,
                                 iters: int = 64):
    """Differentiable, fully on-device GBI via power-iteration spectral
    radius (no host eig callback) — usable inside jit/grad, e.g. as a
    stability regularizer during training.  The reference's GBI
    (e8_active_acoustics.py:183-215) is eager analysis only."""
    rho = spectral_radius(open_loop_matrix(model, subsample), iters=iters)
    return -20 * jnp.log10(jnp.max(rho))
