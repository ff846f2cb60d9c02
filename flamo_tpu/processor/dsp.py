"""DSP processor modules (counterpart of reference flamo/processor/dsp.py, 3778 LoC).

Every processor is an immutable pytree (:class:`flamo_tpu.core.Module`) whose
``param`` leaf holds the raw learnable parameters.  The universal tensor
convention is kept from the reference (dsp.py:365-372): spectra flow as
complex ``(B, M, N, ...)`` with ``M = nfft//2+1`` rfft bins; module
parameters carry no batch/bin axes; each module maps raw params -> per-bin
response and contracts with an einsum.

TPU-first deviations (behavior-preserving):
  * responses of low-order polynomials (biquads, SOS, SVF, GEQ, PEQ) are
    evaluated by Horner at ``z=e^{-j omega}`` instead of zero-padded rffts —
    identical values, O(M) fused elementwise work instead of FFTs,
  * ``assign_value`` is functional — it returns a NEW module,
  * hyper-conditioning (``ext_param``) uses the external raw parameters for
    the forward pass without the reference's no-grad write-back
    (dsp.py:428-432); in a functional framework the caller owns the state,
  * randomness is explicit: constructors accept ``key=`` (default: global
    stream seeded by ``flamo_tpu.set_seed``).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from flamo_tpu.core import Module, complex_dtype_for
from flamo_tpu.utils import next_key, to_complex
from flamo_tpu.functional import (
    bandpass_filter,
    cascade_prods,
    expm_skew,
    HadamardMatrix,
    hadamard_matrix_jnp,
    highpass_filter,
    lowpass_filter,
    poly_response,
    rad2hertz,
    RotationMatrix,
)


def _identity(x):
    return x


def _abs_db_map(x):
    return 20 * jnp.log10(jnp.abs(x))


def _softplus(x):
    return jax.nn.softplus(x)


def _bins_prod_mod(b, m_int, nfft: int):
    """``(b * m_int) % nfft`` with every int32 intermediate < 2**31.

    ``b``: int32 rfft bin indices (< nfft); ``m_int``: int32 sample
    counts (reduced mod nfft here); shapes must broadcast.  One hi/lo
    split of ``m_int`` bounds the largest product by
    ``nfft * max(nfft/256, 256)`` — exact for nfft up to ~2**19, far
    beyond any audio rfft grid.  Used by the ``response_at`` phasor
    paths: integer phase indices mod nfft avoid the f32 large-angle
    precision loss of ``cos(2*pi*b*m/nfft)`` at b*m ~ 1e8."""
    m_int = m_int % nfft
    hi = m_int // 256
    lo = m_int % 256
    return ((b * hi) % nfft * 256 + b * lo) % nfft


# ============================= TRANSFORMS ================================


class Transform(Module):
    """Wraps an arbitrary callable as a module (reference dsp.py:27-66)."""

    leaf_fields = ("param",)

    def __init__(self, transform: Callable = _identity, dtype=jnp.float32):
        self.param = None
        self.transform = transform
        self.dtype = jnp.dtype(dtype)

    def __call__(self, x, ext_param=None):
        return self.transform(x)

    def probe(self, z):
        """Identity transfer for Shell compatibility (returns None)."""
        return None

    def probe_w(self, w):
        return None


class FFT(Transform):
    """rfft along the time axis (dim=1) (reference dsp.py:69-93)."""

    def __init__(self, nfft: int = 2**11, norm: str = "backward",
                 dtype=jnp.float32):
        super().__init__(transform=_identity, dtype=dtype)
        self.nfft = nfft
        self.norm = norm

    def __call__(self, x, ext_param=None):
        return jnp.fft.rfft(x, n=self.nfft, axis=1, norm=self.norm)


class iFFT(Transform):
    """irfft along the bin axis (dim=1) (reference dsp.py:96-119)."""

    def __init__(self, nfft: int = 2**11, norm: str = "backward",
                 dtype=jnp.float32):
        super().__init__(transform=_identity, dtype=dtype)
        self.nfft = nfft
        self.norm = norm

    def __call__(self, x, ext_param=None):
        return jnp.fft.irfft(x, n=self.nfft, axis=1, norm=self.norm)


def _alias_envelope(nfft: int, alias_decay_db: float, dtype) -> jax.Array:
    """gamma^{-n} envelope of length nfft (reference dsp.py:153-160)."""
    gamma = 10 ** (-abs(alias_decay_db) / nfft / 20)
    n = jnp.arange(0, -nfft, -1, dtype=dtype)
    return jnp.asarray(gamma, dtype=dtype) ** n


class FFTAntiAlias(Transform):
    """rfft preceded by the gamma^n decaying envelope — evaluates the
    transform slightly outside the unit circle (reference dsp.py:122-163)."""

    def __init__(self, nfft: int = 2**11, norm: str = "backward",
                 alias_decay_db: float = 0.0, dtype=jnp.float32):
        super().__init__(transform=_identity, dtype=dtype)
        self.nfft = nfft
        self.norm = norm
        self.alias_decay_db = float(alias_decay_db)

    def __call__(self, x, ext_param=None):
        env = _alias_envelope(self.nfft, self.alias_decay_db, self.dtype)
        return jnp.fft.rfft(x * env[None, :, None], n=self.nfft, axis=1,
                            norm=self.norm)


class iFFTAntiAlias(Transform):
    """irfft followed by the gamma^{-n} rising envelope
    (reference dsp.py:166-206)."""

    def __init__(self, nfft: int = 2**11, norm: str = "backward",
                 alias_decay_db: float = 0.0, dtype=jnp.float32):
        super().__init__(transform=_identity, dtype=dtype)
        self.nfft = nfft
        self.norm = norm
        self.alias_decay_db = float(alias_decay_db)

    def __call__(self, x, ext_param=None):
        y = jnp.fft.irfft(x, n=self.nfft, axis=1, norm=self.norm)
        env = _alias_envelope(self.nfft, self.alias_decay_db, self.dtype)
        return y * env[None, :, None]


# ============================= CORE ================================


class DSP(Module):
    """Abstract processor core (reference dsp.py:212-352).

    Subclasses must set ``size`` and implement ``get_freq_convolve``-style
    behavior via :meth:`freq_response` / :meth:`__call__`.
    """

    leaf_fields = ("param",)

    def __init__(self, size: tuple, nfft: int = 2**11,
                 map: Callable = _identity, requires_grad: bool = False,
                 alias_decay_db: float = 0.0, dtype=jnp.float32, key=None):
        assert isinstance(size, tuple), "Size must be a tuple."
        self.size = size
        self.nfft = int(nfft)
        self.map = map
        self.trainable = bool(requires_grad)
        self.alias_decay_db = float(alias_decay_db)
        self.dtype = jnp.dtype(dtype)
        self.param = self.init_param(next_key(key))
        self.initialize_class()

    # -- construction hooks (overridden by subclasses) --------------------
    def init_param(self, key):
        return jax.random.normal(key, self.size, dtype=self.dtype)

    def initialize_class(self):
        self.check_param_shape()
        self.get_io()

    def check_param_shape(self):
        pass

    def get_io(self):
        self.input_channels = self.size[-1]
        self.output_channels = self.size[-2] if len(self.size) >= 2 else self.size[-1]

    # -- static helpers ----------------------------------------------------
    @property
    def gamma(self) -> float:
        """gamma = 10^(-|alias_dB| / nfft / 20) (reference dsp.py:294-307)."""
        return 10 ** (-abs(self.alias_decay_db) / self.nfft / 20)

    @property
    def cdtype(self):
        return complex_dtype_for(self.dtype)

    @property
    def requires_grad(self) -> bool:
        return self.trainable

    @property
    def M(self) -> int:
        return self.nfft // 2 + 1

    def omega(self) -> jax.Array:
        """2 pi m / nfft on the rfft grid, shape (M,)."""
        return (2 * jnp.pi * jnp.arange(self.M, dtype=self.dtype) / self.nfft)

    def response_at(self, bins, ext_param=None):
        """Frequency response evaluated only at rfft bins ``bins``.

        Semantically ``response()[bins]`` for modules whose response
        carries the (M, ...) frequency axis (frequency-flat modules —
        Gain — return their flat response unchanged).  This base
        implementation materializes the full response and gathers,
        which is correct for every module; Filter (short-IR DFT
        contraction on the MXU with exact integer phase) and Delay
        (closed-form phasor) override it so masked objectives (e.g.
        the scattering-FDN's masked_mse step) never touch (M, ...)
        arrays — on TPU a (M, N, N) minor-dim layout pads to (8, 128)
        tiles, ~30x bandwidth waste (docs/performance.md)."""
        return self.response(ext_param)[jnp.asarray(bins)]

    # -- functional parameter update ---------------------------------------
    def assign_value(self, new_value, indx=None) -> "DSP":
        """Functional counterpart of the reference's in-place assign
        (dsp.py:309-328): returns a new module with updated raw params."""
        new_value = jnp.asarray(new_value, dtype=self.dtype)
        if indx is None:
            assert new_value.shape == tuple(self.param.shape), (
                f"New values shape {new_value.shape} is not compatible with "
                f"the parameter shape {tuple(self.param.shape)}."
            )
            return self.replace(param=new_value)
        return self.replace(param=self.param.at[indx].set(new_value))

    def check_input_shape(self, x):
        if (self.M, self.input_channels) != (x.shape[1], x.shape[2]):
            raise ValueError(
                f"parameter shape = {self.size} not compatible with input "
                f"signal of shape = ({x.shape})."
            )

    def _raw(self, ext_param):
        return self.param if ext_param is None else ext_param

    def probe(self, z):
        raise NotImplementedError(
            f"probe() not implemented for {type(self).__name__}"
        )

    def probe_w(self, w):
        """Probe at w = 1/z (reference dsp.py:343-352)."""
        return self.probe(1 / w)


# ============================= GAINS ================================


class Gain(DSP):
    """Frequency-flat MIMO matrix gain (reference dsp.py:357-496).

    input (B,M,N_in,...) x param (N_out,N_in) -> (B,M,N_out,...)."""

    def check_param_shape(self):
        assert len(self.size) == 2, (
            "gains must be 2D. For 1D (parallel) gains use parallelGain module."
        )

    def check_input_shape(self, x):
        if self.input_channels != x.shape[2]:
            raise ValueError(
                f"parameter shape = {self.size} not compatible with input "
                f"signal of shape = ({x.shape})."
            )

    def response(self, ext_param=None):
        return to_complex(self.map(self._raw(ext_param)))

    def response_at(self, bins, ext_param=None):
        """Frequency-flat: the (N_out, N_in) response is identical at
        every bin (see :meth:`DSP.response_at`)."""
        return self.response(ext_param)

    def __call__(self, x, ext_param=None):
        self.check_input_shape(x)
        H = self.response(ext_param)
        return jnp.einsum("mn,bfn...->bfm...", H, x)

    def probe(self, z):
        return to_complex(self.map(self.param))


class parallelGain(Gain):
    """Per-channel (diagonal) gain, param (N,) (reference dsp.py:499-573)."""

    def check_param_shape(self):
        assert len(self.size) == 1, (
            "gains must be 1D, for 2D gains use Gain module."
        )

    def get_io(self):
        self.input_channels = self.size[-1]
        self.output_channels = self.size[-1]

    def __call__(self, x, ext_param=None):
        self.check_input_shape(x)
        h = to_complex(self.map(self._raw(ext_param)))
        return jnp.einsum("n,bfn...->bfn...", h, x)

    def probe(self, z):
        return jnp.diag(to_complex(self.map(self.param)))


# ============================= MATRICES ================================


class Matrix(Gain):
    """Gain with a matrix-type gallery overwriting the map
    (reference dsp.py:579-676): random | orthogonal | hadamard | rotation."""

    def __init__(self, size=(1, 1), nfft=2**11, map=_identity,
                 matrix_type: str = "random", iter: int = 1,
                 requires_grad: bool = False, alias_decay_db: float = 0.0,
                 dtype=jnp.float32, key=None):
        self.matrix_type = matrix_type
        self.iter = iter
        super().__init__(size=size, nfft=nfft, map=map,
                         requires_grad=requires_grad,
                         alias_decay_db=alias_decay_db, dtype=dtype, key=key)

    def initialize_class(self):
        self.check_param_shape()
        self.get_io()
        self.matrix_gallery()

    def matrix_gallery(self):
        N = self.size[0]
        if self.matrix_type in ("random", "identity"):
            # "identity" appears in the reference's e1_mimo example; the
            # reference's `match` (dsp.py:642-665) has no case for it and
            # silently keeps the identity MAP (i.e. it behaves exactly like
            # "random") — accepted here for drop-in compatibility
            self.map = _identity
        elif self.matrix_type == "orthogonal":
            assert N == self.size[1], "Matrix must be square to be orthogonal"
            self.map = expm_skew
        elif self.matrix_type == "hadamard":
            assert N == self.size[1], "Matrix must be square to be Hadamard"
            assert N % 2 == 0, "Matrix must have even dimensions to be Hadamard"
            self.map = HadamardMatrix(N, dtype=self.dtype)
        elif self.matrix_type == "rotation":
            assert N == self.size[1], "Matrix must be square to be a rotation matrix"
            assert N % 2 == 0, (
                "Matrix must have even dimensions to be a rotation matrix"
            )
            rot = RotationMatrix(N, iters=self.iter, dtype=self.dtype)
            self.map = _RotationMap(rot)
        else:
            raise ValueError(f"unknown matrix_type {self.matrix_type}")


class _RotationMap:
    """Map adapter: full raw matrix -> rotation built from its [0,0] angle."""

    def __init__(self, rot: RotationMatrix):
        self.rot = rot

    def __call__(self, x):
        return self.rot(x[0][0])

    def __hash__(self):
        return hash(("_RotationMap", self.rot))

    def __eq__(self, other):
        return isinstance(other, _RotationMap) and other.rot == self.rot


def _householder_map(x):
    return to_complex(x) / jnp.linalg.norm(x, axis=0, keepdims=True)


class HouseholderMatrix(Gain):
    """Orthogonal I - 2 u u^T from a unit vector u (N,1)
    (reference dsp.py:679-783); applied with two vector einsums."""

    def __init__(self, size=(1, 1), nfft=2**11, requires_grad=False,
                 alias_decay_db=0.0, dtype=jnp.float32, key=None):
        assert size[0] == size[1], "Matrix must be square"
        super().__init__(size=(size[0], 1), nfft=nfft, map=_householder_map,
                         requires_grad=requires_grad,
                         alias_decay_db=alias_decay_db, dtype=dtype, key=key)

    def get_io(self):
        self.input_channels = self.size[0]
        self.output_channels = self.size[0]

    def check_input_shape(self, x):
        if self.size[0] != x.shape[2]:
            raise ValueError(
                f"parameter shape = {self.size} not compatible with input "
                f"signal of shape = ({x.shape})."
            )

    def __call__(self, x, ext_param=None):
        self.check_input_shape(x)
        u = self.map(self._raw(ext_param))  # (N, 1) complex
        uTx = jnp.einsum("mn,bfn...->bfm...", u.T, x)
        uuTx = jnp.einsum("nm,bfm...->bfn...", u, uTx)
        return x - 2 * uuTx

    def probe(self, z):
        u = self.map(self.param)
        N = self.size[0]
        return jnp.eye(N, dtype=u.dtype) - 2 * (u @ u.T)


# ============================= FILTERS ================================


class Filter(DSP):
    """General FIR MIMO filter, param (taps, N_out, N_in)
    (reference dsp.py:788-962).  Response = rfft(map(param) * gamma^t)."""

    def __init__(self, size=(1, 1, 1), nfft=2**11, map=_identity,
                 requires_grad=False, alias_decay_db=0.0, dtype=jnp.float32,
                 key=None):
        super().__init__(size=size, nfft=nfft, map=map,
                         requires_grad=requires_grad,
                         alias_decay_db=alias_decay_db, dtype=dtype, key=key)

    def check_param_shape(self):
        assert len(self.size) == 3, (
            "Filter must be 3D, for 2D (parallel) filters use ParallelFilter "
            "module."
        )

    def ir(self, param):
        return self.map(param)

    def response(self, ext_param=None):
        """(M, N_out, N_in) complex frequency response."""
        ir = self.ir(self._raw(ext_param))
        t = jnp.arange(ir.shape[0], dtype=self.dtype)
        env = jnp.asarray(self.gamma, dtype=self.dtype) ** t
        env = env.reshape((-1,) + (1,) * (ir.ndim - 1))
        return jnp.fft.rfft(ir * env, n=self.nfft, axis=0)

    def response_at(self, bins, ext_param=None):
        """``response()[bins]`` without the full-nfft rfft: scale the
        (L, ...) ir by the alias envelope and contract it against an
        exact-phase DFT basis at just those bins — two
        Precision.HIGHEST MXU matmuls of shape (P, L) x (L, prod(size))
        (phase indices are integers mod nfft via :func:`_bins_prod_mod`,
        so there is no large-angle f32 phase loss).  Cost O(P*L) with
        no (M, ...) arrays anywhere; for the reference scattering
        scenario (L=1415, P=2000) that replaces ~3.5 ms/step of padded-
        tile (M, 6, 6) HBM traffic (see docs/performance.md)."""
        if type(self).response is not Filter.response:
            # subclass redefined response() (the IIR ratio families —
            # Biquad/SOS/SVF/GEQ/PEQ/AccurateGEQ): the FIR contraction
            # below would not match; use the correct base gather
            return DSP.response_at(self, bins, ext_param)
        b = jnp.asarray(bins, dtype=jnp.int32)
        ir = self.ir(self._raw(ext_param))
        if ir.shape[0] > self.nfft:  # rfft(n=nfft) truncates; match it
            ir = ir[:self.nfft]
        L = ir.shape[0]
        t = jnp.arange(L, dtype=self.dtype)
        env = jnp.asarray(self.gamma, dtype=self.dtype) ** t
        flat = (ir * env.reshape((-1,) + (1,) * (ir.ndim - 1))).reshape(L, -1)
        idx = _bins_prod_mod(b[:, None],
                             jnp.arange(L, dtype=jnp.int32)[None, :],
                             self.nfft)
        ph = (2 * jnp.pi / self.nfft) * idx.astype(self.dtype)
        hp = jax.lax.Precision.HIGHEST
        re = jnp.matmul(jnp.cos(ph), flat, precision=hp)
        im = jnp.matmul(jnp.sin(ph), flat, precision=hp)
        return jax.lax.complex(re, -im).reshape(
            (b.shape[0],) + ir.shape[1:])

    def __call__(self, x, ext_param=None):
        self.check_input_shape(x)
        H = self.response(ext_param)
        return jnp.einsum("fmn,bfn...->bfm...", H, x)

    def probe(self, z):
        coeff = self.map(self.param)
        K = coeff.shape[0]
        k = jnp.arange(K, dtype=self.dtype)
        weights = (self.gamma ** k).astype(self.cdtype) * z ** (-k)
        weights = weights.reshape((-1,) + (1,) * (coeff.ndim - 1))
        return jnp.sum(to_complex(coeff) * weights, axis=0)


class parallelFilter(Filter):
    """Diagonal FIR filter, param (taps, N) (reference dsp.py:965-1049)."""

    def check_param_shape(self):
        assert len(self.size) == 2, (
            "Filter must be 1D, for 2D filters use Filter module."
        )

    def get_io(self):
        self.input_channels = self.size[-1]
        self.output_channels = self.size[-1]

    def __call__(self, x, ext_param=None):
        self.check_input_shape(x)
        H = self.response(ext_param)
        return jnp.einsum("fn,bfn...->bfn...", H, x)

    def probe(self, z):
        coeff = self.map(self.param)
        K = coeff.shape[0]
        k = jnp.arange(K, dtype=self.dtype)
        weights = (self.gamma ** k).astype(self.cdtype) * z ** (-k)
        weights = weights.reshape((-1,) + (1,) * (coeff.ndim - 1))
        return jnp.diag(jnp.sum(to_complex(coeff) * weights, axis=0))


# -------------------- scattering / velvet feedback matrices ---------------


class ScatteringMatrix(Filter):
    """Learnable paraunitary filter feedback matrix for FDNs
    (reference dsp.py:1052-1203): K+1 orthogonal matrices interleaved with
    parallel delays (Schlecht & Habets, 'Scattering in FDNs')."""

    def __init__(self, size=(1, 1, 1), nfft=2**11, sparsity=3,
                 gain_per_sample=0.9999, pulse_size=1, m_L=None, m_R=None,
                 requires_grad=False, alias_decay_db=0.0, dtype=jnp.float32,
                 key=None):
        from flamo_tpu.auxiliary.scattering import ScatteringMapping

        assert size[1] == size[2], "Matrix must be square"
        self.sparsity = sparsity
        self.gain_per_sample = float(gain_per_sample)
        self.pulse_size = pulse_size
        key = next_key(key)
        kmap, kparam = jax.random.split(key)
        self.map_filter = ScatteringMapping(
            size[-1], n_stages=size[0] - 1, sparsity=sparsity,
            gain_per_sample=gain_per_sample, pulse_size=pulse_size,
            m_L=m_L, m_R=m_R, dtype=dtype, key=kmap,
        )
        super().__init__(size=size, nfft=nfft, map=expm_skew,
                         requires_grad=requires_grad,
                         alias_decay_db=alias_decay_db, dtype=dtype,
                         key=kparam)

    def ir(self, param):
        return self.map_filter(self.map(param))

    def probe(self, z):
        coeff = self.ir(self.param)
        K = coeff.shape[0]
        k = jnp.arange(K, dtype=self.dtype)
        weights = (self.gamma ** k).astype(self.cdtype) * z ** (-k)
        weights = weights.reshape((-1, 1, 1))
        return jnp.sum(to_complex(coeff) * weights, axis=0)


class VelvetNoiseMatrix(ScatteringMatrix):
    """Non-learnable velvet-noise filter feedback matrix
    (reference dsp.py:1207-1348): Hadamard stages + sparse scattering."""

    def __init__(self, size=(1, 1, 1), nfft=2**11, density=0.03,
                 gain_per_sample=0.9999, m_L=None, m_R=None,
                 alias_decay_db=0.0, dtype=jnp.float32, key=None):
        assert size[1] == size[2], "Matrix must be square"
        assert (size[1] & (size[1] - 1)) == 0, (
            "At the moment the Matrix must have dimensions which are powers of 2"
        )
        super().__init__(
            size=size, nfft=nfft, sparsity=math.floor(1 / density),
            gain_per_sample=gain_per_sample, pulse_size=1, m_L=m_L, m_R=m_R,
            requires_grad=False, alias_decay_db=alias_decay_db, dtype=dtype,
            key=key,
        )
        self.map = _identity
        H = hadamard_matrix_jnp(size[-1], dtype=self.dtype)
        self.param = jnp.broadcast_to(H[None], (size[0], size[1], size[2]))


# -------------------- parametric IIR families ------------------------------


def _iir_guard_prods(prodB, prodA):
    """H = prodB / prodA with the reference's eps guard (dsp.py:1520-1526).

    Uses the double-where pattern so the guarded division cannot poison
    gradients with NaN (jnp.where grads flow through BOTH branches)."""
    ok = jnp.abs(prodA) != 0
    prodA_safe = jnp.where(ok, prodA, jnp.ones_like(prodA))
    eps = jnp.finfo(prodA.real.dtype).eps
    return jnp.where(ok, prodB / prodA_safe,
                     jnp.asarray(eps, dtype=prodB.dtype))


def _iir_eps_guard(B, A):
    """Guarded prod-of-sections ratio from materialized (M, K, ...)
    per-section responses."""
    return _iir_guard_prods(jnp.prod(B, axis=1), jnp.prod(A, axis=1))


def _guarded_cascade(be, ae, nfft, backend: str = "xla"):
    """Guarded cascade response from envelope-applied (P, K, ...) taps.

    backend='xla': the fused Horner-product chain (cascade_prods);
    backend='pallas': ONE Mosaic kernel (ops.pallas_solve.
    pallas_sos_cascade) — phasor, sections, and products in vector
    registers with a recompute-in-kernel VJP (1.81x on the
    attenuated-FDN training step: 1219 -> 2203 steps/s on chip).
    Trailing channel dims fold into the kernel's channel axis."""
    if backend == "pallas":
        from flamo_tpu.ops.pallas_solve import pallas_sos_cascade

        P, K = be.shape[:2]
        chans = be.shape[2:]
        H = pallas_sos_cascade(be.reshape(P, K, -1),
                               ae.reshape(P, K, -1), nfft)
        return H.reshape((H.shape[0],) + chans)
    return _iir_guard_prods(*cascade_prods(be, ae, nfft))


def _check_cascade_backend(backend: str):
    if backend not in ("xla", "pallas"):
        raise ValueError(
            f"cascade_backend must be 'xla' or 'pallas', got {backend!r}")


def _cascade_response_guarded(b, a, gamma, nfft):
    """Guarded cascade response straight from SOS coefficients (P, K, ...):
    one fused Horner-product chain via functional.cascade_prods — no
    (M, K, ...) materialization (the B/A returns of get_poly_coeff remain
    available for API parity but are dead code unless a caller uses
    them)."""
    from flamo_tpu.functional import cascade_prods

    P = b.shape[0]
    env = (jnp.asarray(gamma, b.dtype)
           ** jnp.arange(P, dtype=b.dtype)).reshape(
        (P,) + (1,) * (b.ndim - 1))
    return _iir_guard_prods(*cascade_prods(b * env, a * env, nfft))


class Biquad(Filter):
    """Cascaded RBJ biquads (lowpass/highpass/bandpass)
    (reference dsp.py:1353-1604).

    Raw param (K, P, N_out, N_in), P=2 (fc, g) or 3 (fc1, fc2, g); the map
    clamps fc in [0,1] (omega/pi) and gain to +-60 dB."""

    def __init__(self, size=(1, 1), n_sections=1, filter_type="lowpass",
                 nfft=2**11, fs=48000, requires_grad=False,
                 alias_decay_db=0.0, dtype=jnp.float32, key=None,
                 cascade_backend: str = "xla"):
        assert filter_type in ["lowpass", "highpass", "bandpass"], \
            "Invalid filter type"
        _check_cascade_backend(cascade_backend)
        self.cascade_backend = cascade_backend
        self.n_sections = n_sections
        self.filter_type = filter_type
        self.fs = fs
        P = 3 if filter_type == "bandpass" else 2
        super().__init__(size=(n_sections, P, *size), nfft=nfft,
                         map=self._map_clamp, requires_grad=requires_grad,
                         alias_decay_db=alias_decay_db, dtype=dtype, key=key)

    def check_param_shape(self):
        assert len(self.size) == 4, (
            "Parameter size must be 4D, for 3D (parallel) biquads use "
            "parallelBiquad module."
        )

    def init_param(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        p = jnp.zeros(self.size, dtype=self.dtype)
        fc = jax.random.uniform(k1, p[:, 0].shape, dtype=self.dtype,
                                minval=0.0, maxval=0.5)
        p = p.at[:, 0].set(fc)
        if self.filter_type == "bandpass":
            fc2 = jax.random.uniform(k2, p[:, 1].shape, dtype=self.dtype,
                                     minval=float(fc.max()), maxval=1.0)
            p = p.at[:, 1].set(fc2)
        g = jax.random.uniform(k3, p[:, -1].shape, dtype=self.dtype,
                               minval=-1.0, maxval=1.0)
        return p.at[:, -1].set(g)

    def _map_clamp(self, x):
        """Stability map (reference dsp.py:1528-1563)."""
        eps = jnp.finfo(self.dtype).eps
        if self.filter_type == "bandpass":
            fc1 = jnp.clip(x[:, 0], eps, 1 - eps)
            fc2 = jnp.clip(x[:, 1], eps, 1 - eps)
            g = jnp.clip(20 * jnp.log10(jnp.abs(x[:, -1])), -60.0, 60.0)
            return jnp.stack([fc1, fc2, g], axis=1)
        fc = jnp.clip(x[:, 0], 0.0, 1.0)
        g = jnp.clip(20 * jnp.log10(jnp.abs(x[:, 1])), -60.0, 60.0)
        return jnp.stack([fc, g], axis=1)

    def _coeffs(self, mapped):
        if self.filter_type == "lowpass":
            return lowpass_filter(fc=rad2hertz(mapped[:, 0] * jnp.pi, self.fs),
                                  gain=mapped[:, 1], fs=self.fs,
                                  dtype=self.dtype)
        if self.filter_type == "highpass":
            return highpass_filter(fc=rad2hertz(mapped[:, 0] * jnp.pi, self.fs),
                                   gain=mapped[:, 1], fs=self.fs,
                                   dtype=self.dtype)
        return bandpass_filter(fc1=rad2hertz(mapped[:, 0] * jnp.pi, self.fs),
                               fc2=rad2hertz(mapped[:, 1] * jnp.pi, self.fs),
                               gain=mapped[:, 2], fs=self.fs, dtype=self.dtype)

    def get_poly_coeff(self, mapped):
        """(H, B, A) with the 3-tap anti-aliasing envelope
        (reference dsp.py:1464-1526)."""
        b, a = self._coeffs(mapped)  # (3, K, ...)
        env = (jnp.asarray(self.gamma, self.dtype)
               ** jnp.arange(3, dtype=self.dtype))
        env = env.reshape((3,) + (1,) * (b.ndim - 1))
        B = poly_response(b * env, self.nfft)  # (M, K, ...)
        A = poly_response(a * env, self.nfft)
        return _guarded_cascade(
            b * env, a * env, self.nfft,
            getattr(self, "cascade_backend", "xla")), B, A

    def response(self, ext_param=None):
        return self.get_poly_coeff(self.map(self._raw(ext_param)))[0]

    def probe(self, z):
        mapped = self.map(self.param)
        b, a = self._coeffs(mapped)  # (3, K, ...)
        g = jnp.asarray(self.gamma, self.dtype) ** jnp.arange(3, dtype=self.dtype)
        zk = z ** (-jnp.arange(3, dtype=self.dtype))
        w = (g.astype(self.cdtype) * zk).reshape((3,) + (1,) * (b.ndim - 1))
        Bz = jnp.sum(to_complex(b) * w, axis=0)
        Az = jnp.sum(to_complex(a) * w, axis=0)
        return jnp.prod(Bz, axis=0) / jnp.prod(Az, axis=0)


class parallelBiquad(Biquad):
    """Diagonal biquad cascade, param (K, P, N) (reference dsp.py:1607-1764)."""

    def check_param_shape(self):
        assert len(self.size) == 3, (
            "Parameter size must be 3D, for 3D space use Biquad module."
        )

    def get_io(self):
        self.input_channels = self.size[-1]
        self.output_channels = self.size[-1]

    def __call__(self, x, ext_param=None):
        self.check_input_shape(x)
        H = self.response(ext_param)  # (M, N)
        return jnp.einsum("fn,bfn...->bfn...", H, x)

    def probe(self, z):
        return jnp.diag(super().probe(z))


class SOSFilter(Filter):
    """Direct second-order sections (K, 6, N_out, N_in) = [b0,b1,b2,a0,a1,a2];
    non-learnable, identity init (reference dsp.py:1767-1967)."""

    def __init__(self, size=(1, 1), n_sections=1, nfft=2**11, fs=48000,
                 alias_decay_db=0.0, dtype=jnp.float32, normalize_a0=True,
                 key=None):
        self.n_sections = n_sections
        self.fs = fs
        self.normalize_a0 = bool(normalize_a0)
        super().__init__(size=(n_sections, 6, *size), nfft=nfft,
                         map=self._map_a0, requires_grad=False,
                         alias_decay_db=alias_decay_db, dtype=dtype, key=key)

    def check_param_shape(self):
        assert len(self.size) == 4, (
            "Parameter size must be 4D, expected (K, 6, N_out, N_in)."
        )
        assert self.size[1] == 6, (
            "Second dimension must be 6: [b0,b1,b2,a0,a1,a2]."
        )

    def init_param(self, key):
        p = jnp.zeros(self.size, dtype=self.dtype)
        return p.at[:, 0].set(1.0).at[:, 3].set(1.0)

    def _map_a0(self, x):
        if not self.normalize_a0:
            return x
        a0 = x[:, 3]
        eps = jnp.finfo(x.dtype).eps
        a0_safe = jnp.where(jnp.abs(a0) > eps, a0, eps)
        y = x / a0_safe[:, None]
        return y.at[:, 3].set(jnp.ones_like(a0))

    def get_poly_coeff(self, mapped):
        b = mapped[:, 0:3]  # (K, 3, ...)
        a = mapped[:, 3:6]
        b = jnp.moveaxis(b, 1, 0)  # (3, K, ...)
        a = jnp.moveaxis(a, 1, 0)
        env = (jnp.asarray(self.gamma, self.dtype)
               ** jnp.arange(3, dtype=self.dtype))
        env = env.reshape((3,) + (1,) * (b.ndim - 1))
        B = poly_response(b * env, self.nfft)
        A = poly_response(a * env, self.nfft)
        return _guarded_cascade(
            b * env, a * env, self.nfft,
            getattr(self, "cascade_backend", "xla")), B, A

    def response(self, ext_param=None):
        return self.get_poly_coeff(self.map(self._raw(ext_param)))[0]

    def probe(self, z):
        mapped = self.map(self.param)
        g = jnp.asarray(self.gamma, self.dtype) ** jnp.arange(3, dtype=self.dtype)
        zk = z ** (-jnp.arange(3, dtype=self.dtype))
        w = (g.astype(self.cdtype) * zk).reshape((1, 3) + (1,) * (mapped.ndim - 2))
        Bz = jnp.sum(to_complex(mapped[:, 0:3]) * w, axis=1)  # (K, ...)
        Az = jnp.sum(to_complex(mapped[:, 3:6]) * w, axis=1)
        return jnp.prod(Bz / Az, axis=0)


class parallelSOSFilter(SOSFilter):
    """Diagonal SOS (K, 6, N) (reference dsp.py:1970-2073)."""

    def check_param_shape(self):
        assert len(self.size) == 3, (
            "Parameter size must be 3D, expected (K, 6, N)."
        )
        assert self.size[1] == 6, (
            "Second dimension must be 6: [b0,b1,b2,a0,a1,a2]."
        )

    def get_io(self):
        self.input_channels = self.size[-1]
        self.output_channels = self.size[-1]

    def __call__(self, x, ext_param=None):
        self.check_input_shape(x)
        H = self.response(ext_param)
        return jnp.einsum("fn,bfn...->bfn...", H, x)

    def probe(self, z):
        return jnp.diag(super().probe(z))


class SVF(Filter):
    """Serially cascaded state-variable filters (reference dsp.py:2076-2374).

    Raw param (5, K, N_out, N_in); stability-by-construction maps:
    f = tan(pi sigmoid(x) / 2), R = softplus(x)/ln 2, mixing coeffs per
    filter_type with G = 10^{-softplus(x)} (Lee et al., 'Differentiable
    artificial reverberation')."""

    _FILTER_TYPES = ("lowpass", "highpass", "bandpass", "lowshelf",
                     "highshelf", "peaking", "notch", None)

    def __init__(self, size=(1, 1), n_sections=1, filter_type=None,
                 nfft=2**11, fs=48000, requires_grad=False,
                 alias_decay_db=0.0, dtype=jnp.float32, key=None):
        assert filter_type in self._FILTER_TYPES, "Invalid filter type"
        self.fs = fs
        self.n_sections = n_sections
        self.filter_type = filter_type
        super().__init__(size=(5, n_sections, *size), nfft=nfft,
                         map=self.map_param2svf, requires_grad=requires_grad,
                         alias_decay_db=alias_decay_db, dtype=dtype, key=key)

    def check_param_shape(self):
        assert len(self.size) == 4, (
            "Filter parameter space must be 4D, for 3D (parallel) filters "
            "use parallelSVF module."
        )

    def param2freq(self, p):
        return jnp.tan(jnp.pi * jax.nn.sigmoid(p) * 0.5)

    def param2R(self, p):
        return jax.nn.softplus(p) / jnp.log(jnp.asarray(2.0, self.dtype))

    def param2mix(self, p, R=None):
        G = 10 ** (-jax.nn.softplus(p[0]))
        ones, zeros = jnp.ones_like(G), jnp.zeros_like(G)
        ft = self.filter_type
        if ft == "lowpass":
            return jnp.stack([ones, zeros, zeros])
        if ft == "highpass":
            return jnp.stack([zeros, zeros, ones])
        if ft == "bandpass":
            return jnp.stack([zeros, ones, zeros])
        if ft == "lowshelf":
            return jnp.stack([ones, 2 * R * jnp.sqrt(G), G])
        if ft == "highshelf":
            return jnp.stack([G, 2 * R * jnp.sqrt(G), ones])
        if ft in ("peaking", "notch"):
            return jnp.stack([ones, 2 * R * jnp.sqrt(G), ones])
        # general SVF: mixing coeffs are raw + bias (reference dsp.py:2343-2347)
        bias = jnp.ones_like(p).at[1].set(2.0)
        return p + bias

    def map_param2svf(self, param):
        """Raw params -> (f, R, mLP, mBP, mHP) (reference dsp.py:2349-2364).

        NOTE: the reference assigns R=1 for shelf types and then immediately
        overwrites it with R=r in the following else-branch — the shelf
        special case is dead code there; we reproduce the effective
        behavior (R=r) for parity."""
        f = self.param2freq(param[0])
        r = self.param2R(param[1])
        if self.filter_type == "peaking":
            R = 1 / r
            m = self.param2mix(param[2:], r)
        else:
            R = r
            m = self.param2mix(param[2:], R)
        return f, R, m[0], m[1], m[2]

    def get_poly_coeff(self, mapped):
        f, R, mLP, mBP, mHP = mapped
        b = jnp.stack([
            f**2 * mLP + f * mBP + mHP,
            2 * f**2 * mLP - 2 * mHP,
            f**2 * mLP - f * mBP + mHP,
        ])
        a = jnp.stack([f**2 + 2 * R * f + 1, 2 * f**2 - 2,
                       f**2 - 2 * R * f + 1])
        env = (jnp.asarray(self.gamma, self.dtype)
               ** jnp.arange(3, dtype=self.dtype))
        env = env.reshape((3,) + (1,) * (b.ndim - 1))
        B = poly_response(b * env, self.nfft)
        A = poly_response(a * env, self.nfft)
        return _guarded_cascade(
            b * env, a * env, self.nfft,
            getattr(self, "cascade_backend", "xla")), B, A

    def response(self, ext_param=None):
        return self.get_poly_coeff(self.map(self._raw(ext_param)))[0]

    def probe(self, z):
        f, R, mLP, mBP, mHP = self.map(self.param)
        b = jnp.stack([f**2 * mLP + f * mBP + mHP, 2 * f**2 * mLP - 2 * mHP,
                       f**2 * mLP - f * mBP + mHP])
        a = jnp.stack([f**2 + 2 * R * f + 1, 2 * f**2 - 2,
                       f**2 - 2 * R * f + 1])
        g = jnp.asarray(self.gamma, self.dtype) ** jnp.arange(3, dtype=self.dtype)
        zk = z ** (-jnp.arange(3, dtype=self.dtype))
        w = (g.astype(self.cdtype) * zk).reshape((3,) + (1,) * (b.ndim - 1))
        Bz = jnp.sum(to_complex(b) * w, axis=0)
        Az = jnp.sum(to_complex(a) * w, axis=0)
        return jnp.prod(Bz / Az, axis=0)


class parallelSVF(SVF):
    """Diagonal SVF, param (5, K, N) (reference dsp.py:2377-2464)."""

    def check_param_shape(self):
        assert len(self.size) == 3, (
            "Filter parameter space must be 3D, for 4D filters use SVF module."
        )

    def get_io(self):
        self.input_channels = self.size[-1]
        self.output_channels = self.size[-1]

    def __call__(self, x, ext_param=None):
        self.check_input_shape(x)
        H = self.response(ext_param)
        return jnp.einsum("fn,bfn...->bfn...", H, x)

    def probe(self, z):
        return jnp.diag(super().probe(z))


class GEQ(Filter):
    """Graphic EQ (1 or 1/3 octave); params = command gains (K, N_out, N_in),
    K = n_bands+3 (reference dsp.py:2467-2611).  The per-channel Python band
    design of the reference is vectorized with vmap."""

    def __init__(self, size=(1, 1), octave_interval=1, nfft=2**11, fs=48000,
                 map=_abs_db_map, requires_grad=False, alias_decay_db=0.0,
                 dtype=jnp.float32, key=None, cascade_backend: str = "xla"):
        from flamo_tpu.auxiliary.eq import eq_freqs

        _check_cascade_backend(cascade_backend)
        self.cascade_backend = cascade_backend
        self.octave_interval = octave_interval
        self.fs = fs
        center, shelving = eq_freqs(interval=octave_interval)
        self.center_freq = tuple(float(f) for f in np.asarray(center))
        self.shelving_crossover = tuple(float(f) for f in np.asarray(shelving))
        self.n_gains = len(self.center_freq) + 3
        super().__init__(size=(self.n_gains, *size), nfft=nfft, map=map,
                         requires_grad=requires_grad,
                         alias_decay_db=alias_decay_db, dtype=dtype, key=key)

    def init_param(self, key):
        return jax.random.uniform(key, self.size, dtype=self.dtype,
                                  minval=10 ** (-6 / 20), maxval=10 ** (6 / 20))

    def check_param_shape(self):
        assert len(self.size) == 3, (
            "Filter must be 3D, for 2D (parallel) filters use ParallelGEQ "
            "module."
        )

    def _design(self, gain_db):
        """gain_db (K, ...) -> SOS (b, a) each (3, n_bands, ...)."""
        from flamo_tpu.auxiliary.eq import geq

        cf = jnp.asarray(self.center_freq, dtype=self.dtype)
        sf = jnp.asarray(self.shelving_crossover, dtype=self.dtype)
        R = jnp.asarray(2.7, dtype=self.dtype)

        def one(g):
            return geq(center_freq=cf, shelving_freq=sf, R=R, gain_db=g,
                       fs=self.fs, dtype=self.dtype)

        flat = gain_db.reshape(gain_db.shape[0], -1)
        b, a = jax.vmap(one, in_axes=1, out_axes=2)(flat)
        return (b.reshape(b.shape[:2] + gain_db.shape[1:]),
                a.reshape(a.shape[:2] + gain_db.shape[1:]))

    def get_poly_coeff(self, gain_db):
        b, a = self._design(gain_db)
        env = (jnp.asarray(self.gamma, self.dtype)
               ** jnp.arange(3, dtype=self.dtype))
        env = env.reshape((3,) + (1,) * (b.ndim - 1))
        B = poly_response(b * env, self.nfft)
        A = poly_response(a * env, self.nfft)
        return _guarded_cascade(
            b * env, a * env, self.nfft, self.cascade_backend), B, A

    def response(self, ext_param=None):
        return self.get_poly_coeff(self.map(self._raw(ext_param)))[0]

    def probe(self, z):
        b, a = self._design(self.map(self.param))
        g = jnp.asarray(self.gamma, self.dtype) ** jnp.arange(3, dtype=self.dtype)
        zk = z ** (-jnp.arange(3, dtype=self.dtype))
        w = (g.astype(self.cdtype) * zk).reshape((3,) + (1,) * (b.ndim - 1))
        Bz = jnp.sum(to_complex(b) * w, axis=0)
        Az = jnp.sum(to_complex(a) * w, axis=0)
        return jnp.prod(Bz / Az, axis=0)


class parallelGEQ(GEQ):
    """Diagonal GEQ, param (K, N) (reference dsp.py:2614-2692)."""

    def check_param_shape(self):
        assert len(self.size) == 2, (
            "Filter must be 2D, for 3D filters use GEQ module."
        )

    def get_io(self):
        self.input_channels = self.size[-1]
        self.output_channels = self.size[-1]

    def __call__(self, x, ext_param=None):
        self.check_input_shape(x)
        H = self.response(ext_param)
        return jnp.einsum("fn,bfn...->bfn...", H, x)

    def probe(self, z):
        return jnp.diag(super().probe(z))


class PEQ(Filter):
    """Parametric EQ: low shelf + peaks + high shelf
    (reference dsp.py:2695-2877).  Raw (n_bands, 3, N_out, N_in) as
    (f, R, G); designs 'biquad' (RBJ, G = 10^{G/40}) or 'svf'."""

    def __init__(self, size=(1, 1), n_bands=10, f_min=20.0, f_max=20000.0,
                 design="biquad", fs=48000, nfft=2**11, map=_identity,
                 requires_grad=False, alias_decay_db=0.0, dtype=jnp.float32,
                 key=None, cascade_backend: str = "xla"):
        assert design in ("biquad", "svf")
        _check_cascade_backend(cascade_backend)
        self.cascade_backend = cascade_backend
        self.n_bands = n_bands
        self.design = design
        self.fs = fs
        self.f_min = float(f_min)
        self.f_max = float(f_max)
        k = np.arange(1, n_bands + 1, dtype=np.float64)
        self.center_freq_bias = tuple(
            float(v) for v in f_min * (f_max / f_min) ** ((k - 1) / (n_bands - 1))
        )
        super().__init__(size=(n_bands, 3, *size), nfft=nfft, map=map,
                         requires_grad=requires_grad,
                         alias_decay_db=alias_decay_db, dtype=dtype, key=key)

    def init_param(self, key):
        return jax.random.uniform(key, self.size, dtype=self.dtype)

    def check_param_shape(self):
        assert len(self.size) == 4, (
            "Filter must be 3D, for 2D (parallel) filters use ParallelPEQ "
            "module."
        )

    def map_eq(self, param):
        """Sigmoid + log-spaced bias frequency mapping
        (reference dsp.py:2852-2877)."""
        R = param[:, 1]
        G = param[:, 2]
        bias = jnp.asarray(self.center_freq_bias, dtype=self.dtype)
        extra = (1,) * (param.ndim - 2)
        if self.design == "biquad":
            bias_w = bias.reshape((-1,) + extra) / self.fs * 2 * jnp.pi
            min_f = 2 * jnp.pi * self.f_min / self.fs
            max_f = 2 * jnp.pi * self.f_max / self.fs
            f = jnp.clip(jax.nn.sigmoid(param[:, 0]) + bias_w, min_f, max_f)
        else:  # svf
            w = 2 * bias / self.fs
            bias_w = jnp.log(w / (1 - w)).reshape((-1,) + extra)
            f = jnp.tan(jnp.pi * jax.nn.sigmoid(param[:, 0] + bias_w) * 0.5)
        return jnp.stack([f, R, G])

    def compute_biquad_coeff(self, f, R, G, type="peaking"):
        """(a, b) each (..., 3) — same coefficient math as the reference
        (dsp.py:2790-2842)."""
        if self.design == "svf":
            G = 10 ** (G / 20)
            if type == "peaking":
                mLP, mBP, mHP = jnp.ones_like(G), 2 * R * jnp.sqrt(G), jnp.ones_like(G)
            elif type == "lowshelf":
                mLP, mBP, mHP = G, 2 * R * jnp.sqrt(G), jnp.ones_like(G)
            else:  # highshelf
                mLP, mBP, mHP = jnp.ones_like(G), 2 * R * jnp.sqrt(G), G
            b = jnp.stack([f**2 * mLP + f * mBP + mHP,
                           2 * f**2 * mLP - 2 * mHP,
                           f**2 * mLP - f * mBP + mHP], axis=-1)
            a = jnp.stack([f**2 + 2 * R * f + 1, 2 * f**2 - 2,
                           f**2 - 2 * R * f + 1], axis=-1)
        else:  # biquad
            G = 10 ** (G / 40)
            cosf, sinf = jnp.cos(f), jnp.sin(f)
            if type == "peaking":
                alpha = sinf / (2 * R)
                b = jnp.stack([1 + alpha * G, -2 * cosf, 1 - alpha * G], axis=-1)
                a = jnp.stack([1 + alpha / G, -2 * cosf, 1 - alpha / G], axis=-1)
            elif type == "lowshelf":
                alpha = sinf * jnp.sqrt((G**2 + 1) * (1 / R - 1) + 2 * G)
                b = jnp.stack([
                    G * ((G + 1) - (G - 1) * cosf + alpha),
                    2 * G * ((G - 1) - (G + 1) * cosf),
                    G * ((G + 1) - (G - 1) * cosf - alpha)], axis=-1)
                a = jnp.stack([
                    (G + 1) + (G - 1) * cosf + alpha,
                    -2 * ((G - 1) + (G + 1) * cosf),
                    (G + 1) + (G - 1) * cosf - alpha], axis=-1)
            else:  # highshelf
                alpha = sinf * jnp.sqrt((G**2 + 1) * (1 / R - 1) + 2 * G)
                b = jnp.stack([
                    G * ((G + 1) + (G - 1) * cosf + alpha),
                    -2 * G * ((G - 1) + (G + 1) * cosf),
                    G * ((G + 1) + (G - 1) * cosf - alpha)], axis=-1)
                a = jnp.stack([
                    (G + 1) - (G - 1) * cosf + alpha,
                    2 * ((G - 1) - (G + 1) * cosf),
                    (G + 1) - (G - 1) * cosf - alpha], axis=-1)
        return a, b

    def _band_sos(self, mapped):
        """mapped (3, n_bands, ...) -> (a, b) each (n_bands, 3, ...)."""
        f, R, G = mapped[0], mapped[1], mapped[2]
        a_ls, b_ls = self.compute_biquad_coeff(f[0], R[0], G[0], "lowshelf")
        a_hs, b_hs = self.compute_biquad_coeff(f[-1], R[-1], G[-1], "highshelf")
        a_pk, b_pk = self.compute_biquad_coeff(f[1:-1], R[1:-1], G[1:-1],
                                               "peaking")
        # coeff axis last -> move to position 1
        a = jnp.concatenate([a_ls[None], a_pk, a_hs[None]], axis=0)
        b = jnp.concatenate([b_ls[None], b_pk, b_hs[None]], axis=0)
        a = jnp.moveaxis(a, -1, 1)
        b = jnp.moveaxis(b, -1, 1)
        return a, b

    def get_poly_coeff(self, param):
        mapped = self.map_eq(param)
        a, b = self._band_sos(mapped)  # (n_bands, 3, ...)
        env = (jnp.asarray(self.gamma, self.dtype)
               ** jnp.arange(3, dtype=self.dtype))
        env = env.reshape((1, 3) + (1,) * (b.ndim - 2))
        b3 = jnp.moveaxis(b * env, 1, 0)  # (3, n_bands, ...)
        a3 = jnp.moveaxis(a * env, 1, 0)
        B = poly_response(b3, self.nfft)  # (M, n_bands, ...)
        A = poly_response(a3, self.nfft)
        return _guarded_cascade(
            b3, a3, self.nfft,
            getattr(self, "cascade_backend", "xla")), B, A

    def response(self, ext_param=None):
        return self.get_poly_coeff(self.map(self._raw(ext_param)))[0]

    def probe(self, z):
        mapped = self.map_eq(self.map(self.param))
        a, b = self._band_sos(mapped)
        g = jnp.asarray(self.gamma, self.dtype) ** jnp.arange(3, dtype=self.dtype)
        zk = z ** (-jnp.arange(3, dtype=self.dtype))
        w = (g.astype(self.cdtype) * zk).reshape((1, 3) + (1,) * (b.ndim - 2))
        Bz = jnp.sum(to_complex(b) * w, axis=1)
        Az = jnp.sum(to_complex(a) * w, axis=1)
        return jnp.prod(Bz / Az, axis=0)


class parallelPEQ(PEQ):
    """Diagonal PEQ, param (n_bands, 3, N) (reference dsp.py:2880-3000)."""

    def check_param_shape(self):
        assert len(self.size) == 3, (
            "Filter must be 2D in the parallel configuration, for 3D filters "
            "use PEQ module."
        )

    def get_io(self):
        self.input_channels = self.size[-1]
        self.output_channels = self.size[-1]

    def __call__(self, x, ext_param=None):
        self.check_input_shape(x)
        H = self.response(ext_param)
        return jnp.einsum("fn,bfn...->bfn...", H, x)

    def probe(self, z):
        return jnp.diag(super().probe(z))


class AccurateGEQ(Filter):
    """Non-learnable GEQ with an inner bounded least-squares fit of the
    command gains (Schlecht & Habets DAFx-17 accurate RT control)
    (reference dsp.py:3003-3136).

    TPU design note: the reference re-runs the (no-grad) LBFGS design inside
    every forward; here the SOS design is computed once on the host at
    construction / ``assign_value`` and the cached coefficients are used in
    the jitted response — numerically equivalent, off the hot loop."""

    leaf_fields = ("param", "sos_b", "sos_a")

    def __init__(self, size=(1, 1), octave_interval=1, nfft=2**11, fs=48000,
                 map=_abs_db_map, alias_decay_db=0.0, start_freq=31.25,
                 end_freq=16000.0, dtype=jnp.float32, key=None):
        from flamo_tpu.auxiliary.eq import eq_freqs

        self.octave_interval = octave_interval
        self.fs = fs
        self.start_freq = float(start_freq)
        self.end_freq = float(end_freq)
        center, shelving = eq_freqs(interval=octave_interval,
                                    start_freq=start_freq, end_freq=end_freq)
        self.center_freq = tuple(float(f) for f in np.asarray(center))
        self.shelving_crossover = tuple(float(f) for f in np.asarray(shelving))
        self.n_gains = len(self.center_freq) + 2
        self.sos_b = None
        self.sos_a = None
        super().__init__(size=(self.n_gains, *size), nfft=nfft, map=map,
                         requires_grad=False, alias_decay_db=alias_decay_db,
                         dtype=dtype, key=key)
        self._design_cache()

    def init_param(self, key):
        return jax.random.uniform(key, self.size, dtype=self.dtype,
                                  minval=10 ** (-6 / 20), maxval=10 ** (6 / 20))

    def check_param_shape(self):
        assert len(self.size) == 3, (
            "Filter must be 3D, for 2D (parallel) filters use ParallelGEQ "
            "module."
        )

    def _design_cache(self):
        """Run the accurate (bounded-LS) design host-side; cache SOS leaves."""
        from flamo_tpu.auxiliary.eq import accurate_geq

        target = np.asarray(self.map(self.param))  # dB targets (K, ...)
        flat = target.reshape(target.shape[0], -1)
        bs, as_ = [], []
        for i in range(flat.shape[1]):
            b, a = accurate_geq(
                target_gain=flat[:, i],
                center_freq=np.asarray(self.center_freq),
                shelving_crossover=np.asarray(self.shelving_crossover),
                fs=self.fs,
            )
            bs.append(np.asarray(b))
            as_.append(np.asarray(a))
        b = np.stack(bs, axis=-1).reshape(bs[0].shape + target.shape[1:])
        a = np.stack(as_, axis=-1).reshape(as_[0].shape + target.shape[1:])
        self.sos_b = jnp.asarray(b, dtype=self.dtype)  # (3, n_bands+1, ...)
        self.sos_a = jnp.asarray(a, dtype=self.dtype)

    def assign_value(self, new_value, indx=None):
        mod = super().assign_value(new_value, indx)
        mod._design_cache()
        return mod

    def get_poly_coeff(self, _unused=None):
        env = (jnp.asarray(self.gamma, self.dtype)
               ** jnp.arange(3, dtype=self.dtype))
        env = env.reshape((3,) + (1,) * (self.sos_b.ndim - 1))
        B = poly_response(self.sos_b * env, self.nfft)
        A = poly_response(self.sos_a * env, self.nfft)
        return _guarded_cascade(
            self.sos_b * env, self.sos_a * env, self.nfft,
            getattr(self, "cascade_backend", "xla")), B, A

    def response(self, ext_param=None):
        return self.get_poly_coeff()[0]

    def probe(self, z):
        g = jnp.asarray(self.gamma, self.dtype) ** jnp.arange(3, dtype=self.dtype)
        zk = z ** (-jnp.arange(3, dtype=self.dtype))
        w = (g.astype(self.cdtype) * zk).reshape(
            (3,) + (1,) * (self.sos_b.ndim - 1))
        Bz = jnp.sum(to_complex(self.sos_b) * w, axis=0)
        Az = jnp.sum(to_complex(self.sos_a) * w, axis=0)
        return jnp.prod(Bz / Az, axis=0)


class parallelAccurateGEQ(AccurateGEQ):
    """Diagonal accurate GEQ, param (K, N) (reference dsp.py:3139-3221)."""

    def check_param_shape(self):
        assert len(self.size) == 2, (
            "Filter must be 2D, for 3D filters use GEQ module."
        )

    def get_io(self):
        self.input_channels = self.size[-1]
        self.output_channels = self.size[-1]

    def __call__(self, x, ext_param=None):
        self.check_input_shape(x)
        H = self.response(ext_param)
        return jnp.einsum("fn,bfn...->bfn...", H, x)

    def probe(self, z):
        return jnp.diag(super().probe(z))


# ============================= DELAYS ================================


class Delay(DSP):
    """MIMO delay matrix in the frequency domain (reference dsp.py:3226-3450).

    Param stored in seconds x unit (``s2sample``/``sample2s``); response
    gamma^m e^{-j omega m}, optional integer rounding (``isint``);
    trainable delays force a softplus map (dsp.py:3418-3419)."""

    def __init__(self, size=(1, 1), max_len=2000, isint=False, unit=100,
                 nfft=2**11, fs=48000, requires_grad=False,
                 alias_decay_db=0.0, dtype=jnp.float32, key=None):
        self.fs = fs
        self.max_len = int(max_len)
        self.unit = unit
        self.isint = bool(isint)
        self.map = _softplus if requires_grad else _identity
        super().__init__(size=size, nfft=nfft, map=self.map,
                         requires_grad=requires_grad,
                         alias_decay_db=alias_decay_db, dtype=dtype, key=key)

    def init_param(self, key):
        if self.isint:
            delay_len = jax.random.randint(key, self.size, 1, self.max_len)
            delay_len = delay_len.astype(self.dtype)
        else:
            delay_len = jax.random.uniform(key, self.size, dtype=self.dtype) \
                * self.max_len
        self.order = int(self.max_len) + 1
        return self.sample2s(delay_len)

    def check_param_shape(self):
        assert len(self.size) == 2, (
            "delay must be 2D, for 1D (parallel) delay use parallelDelay "
            "module."
        )

    def s2sample(self, delay):
        return jnp.asarray(delay) * self.fs / self.unit

    def sample2s(self, delay):
        return jnp.asarray(delay) / self.fs * self.unit

    def get_delays(self, param):
        m = self.s2sample(self.map(param))
        return jnp.round(m) if self.isint else m

    def response(self, ext_param=None):
        m = self.get_delays(self._raw(ext_param))  # (N_out, N_in)
        w = self.omega()
        phase = jnp.einsum("f,mn->fmn", w, m)
        gam = jnp.asarray(self.gamma, self.dtype)
        return (gam ** m)[None] * jnp.exp(-1j * phase)

    def response_at(self, bins, ext_param=None):
        """Closed-form ``gamma^m e^{-j w m}`` at just ``bins`` (see
        :meth:`DSP.response_at`; shape-generic over Delay's (N_out,
        N_in) and parallelDelay's (N,) delay arrays).  The phase
        ``b * m`` is reduced mod nfft with the integer part of ``m``
        in exact int32 arithmetic; the fractional part — nonzero only
        for trainable non-integer delays, and the sole leaf the delay
        gradient flows through (d phase/d m = 2 pi b / nfft, matching
        the exact derivative since floor is piecewise-constant) — is
        added in f32, where its < nfft magnitude keeps rounding at
        ~1e-7 rad."""
        m = self.get_delays(self._raw(ext_param))
        b = jnp.asarray(bins, dtype=jnp.int32)
        mi = jax.lax.stop_gradient(jnp.floor(m))
        frac = m - mi
        bb = b.reshape((-1,) + (1,) * m.ndim)
        idx = _bins_prod_mod(bb, mi.astype(jnp.int32), self.nfft)
        ph = (2 * jnp.pi / self.nfft) * (
            idx.astype(self.dtype) + bb.astype(self.dtype) * frac)
        gam = jnp.asarray(self.gamma, self.dtype)
        return (gam ** m)[None] * jnp.exp(-1j * ph)

    def __call__(self, x, ext_param=None):
        self.check_input_shape(x)
        return jnp.einsum("fmn,bfn...->bfm...", self.response(ext_param), x)

    def probe(self, z):
        m = self.get_delays(self.param)
        return (jnp.asarray(self.gamma, self.dtype) ** m).astype(self.cdtype) \
            * (1.0 / z) ** m


class parallelDelay(Delay):
    """Diagonal delays (N,) — the FDN delay-line module
    (reference dsp.py:3453-3551)."""

    def check_param_shape(self):
        assert len(self.size) == 1, (
            "delays must be 1D, for 2D delays use Delay module."
        )

    def get_io(self):
        self.input_channels = self.size[-1]
        self.output_channels = self.size[-1]

    def response(self, ext_param=None):
        m = self.get_delays(self._raw(ext_param))  # (N,)
        w = self.omega()
        phase = jnp.einsum("f,n->fn", w, m)
        gam = jnp.asarray(self.gamma, self.dtype)
        return (gam ** m)[None] * jnp.exp(-1j * phase)

    def __call__(self, x, ext_param=None):
        self.check_input_shape(x)
        return jnp.einsum("fn,bfn...->bfn...", self.response(ext_param), x)

    def probe(self, z):
        m = self.get_delays(self.param)
        h = (jnp.asarray(self.gamma, self.dtype) ** m).astype(self.cdtype) \
            * (1.0 / z) ** m
        return jnp.diag(h)


class GainDelay(DSP):
    """Fused MIMO gain + delay stage, param (2, N_out, N_in)
    (reference dsp.py:3554-3702); avoids materializing expanded responses."""

    def __init__(self, size=(1, 1), max_len=2000, isint=False, unit=100,
                 nfft=2**11, fs=48000, map_gain=None, map_delay=None,
                 requires_grad=False, alias_decay_db=0.0, dtype=jnp.float32,
                 key=None):
        self.fs = fs
        self.max_len = int(max_len)
        self.unit = unit
        self.isint = bool(isint)
        self.map_gain = map_gain if map_gain is not None else _identity
        if map_delay is not None:
            self.map_delay = map_delay
        else:
            self.map_delay = _softplus if requires_grad else _identity
        super().__init__(size=(2, *size), nfft=nfft,
                         requires_grad=requires_grad,
                         alias_decay_db=alias_decay_db, dtype=dtype, key=key)

    def init_param(self, key):
        gain_shape = self.size[1:]
        if self.isint:
            d = jax.random.randint(key, gain_shape, 1, self.max_len)
            d = d.astype(self.dtype)
        else:
            d = jax.random.uniform(key, gain_shape, dtype=self.dtype) * self.max_len
        self.order = int(self.max_len) + 1
        return jnp.stack([jnp.ones(gain_shape, dtype=self.dtype),
                          self.sample2s(d)])

    def check_param_shape(self):
        assert len(self.size) == 3 and self.size[0] == 2, (
            "GainDelay parameters must have shape (2, N_out, N_in)."
        )

    def s2sample(self, delay):
        return jnp.asarray(delay) * self.fs / self.unit

    def sample2s(self, delay):
        return jnp.asarray(delay) / self.fs * self.unit

    def _gain_delay(self, param):
        gain = to_complex(self.map_gain(param[0]))
        d = self.s2sample(self.map_delay(param[1]))
        if self.isint:
            d = jnp.round(d)
        return gain, d

    def response(self, ext_param=None):
        gain, d = self._gain_delay(self._raw(ext_param))
        w = self.omega()
        phase = jnp.einsum("f,mn->fmn", w, d)
        gam = jnp.asarray(self.gamma, self.dtype)
        return gain[None] * (gam ** d)[None] * jnp.exp(-1j * phase)

    def __call__(self, x, ext_param=None):
        self.check_input_shape(x)
        return jnp.einsum("fmn,bfn...->bfm...", self.response(ext_param), x)

    def probe(self, z):
        gain, d = self._gain_delay(self.param)
        return gain * (jnp.asarray(self.gamma, self.dtype) ** d).astype(
            self.cdtype) * (1.0 / z) ** d


class parallelGainDelay(GainDelay):
    """Diagonal gain+delay, param (2, N) (reference dsp.py:3705-3779)."""

    def check_param_shape(self):
        assert len(self.size) == 2 and self.size[0] == 2, (
            "parallelGainDelay parameters must have shape (2, N), for MIMO "
            "use GainDelay module."
        )

    def get_io(self):
        self.input_channels = self.size[-1]
        self.output_channels = self.size[-1]

    def response(self, ext_param=None):
        gain, d = self._gain_delay(self._raw(ext_param))
        w = self.omega()
        phase = jnp.einsum("f,n->fn", w, d)
        gam = jnp.asarray(self.gamma, self.dtype)
        return gain[None] * (gam ** d)[None] * jnp.exp(-1j * phase)

    def __call__(self, x, ext_param=None):
        self.check_input_shape(x)
        return jnp.einsum("fn,bfn...->bfn...", self.response(ext_param), x)

    def probe(self, z):
        gain, d = self._gain_delay(self.param)
        h = gain * (jnp.asarray(self.gamma, self.dtype) ** d).astype(
            self.cdtype) * (1.0 / z) ** d
        return jnp.diag(h)


# ===================== per-bin linear-operator protocol ====================
# Modules expose their per-bin linear map in the cheapest faithful form
# (see flamo_tpu/ops/linop.py).  Recursion/Series use this to assemble
# closed-loop matrices without feeding (M, N, N) identities through the
# module graph (the reference's identity-feed, system.py:417-425).

def _mr_flat(self, ext_param=None):
    return "flat", self.response(ext_param)


def _mr_full(self, ext_param=None):
    return "full", self.response(ext_param)


def _mr_diag(self, ext_param=None):
    return "diag", self.response(ext_param)


def _mr_parallel_gain(self, ext_param=None):
    h = to_complex(self.map(self._raw(ext_param)))
    return "diag", h[None, :]


def _mr_householder(self, ext_param=None):
    u = self.map(self._raw(ext_param))
    N = self.size[0]
    return "flat", jnp.eye(N, dtype=u.dtype) - 2 * (u @ u.T)


Gain.matrix_response = _mr_flat
parallelGain.matrix_response = _mr_parallel_gain
HouseholderMatrix.matrix_response = _mr_householder
Filter.matrix_response = _mr_full
parallelFilter.matrix_response = _mr_diag
Biquad.matrix_response = _mr_full
parallelBiquad.matrix_response = _mr_diag
SOSFilter.matrix_response = _mr_full
parallelSOSFilter.matrix_response = _mr_diag
SVF.matrix_response = _mr_full
parallelSVF.matrix_response = _mr_diag
GEQ.matrix_response = _mr_full
parallelGEQ.matrix_response = _mr_diag
PEQ.matrix_response = _mr_full
parallelPEQ.matrix_response = _mr_diag
AccurateGEQ.matrix_response = _mr_full
parallelAccurateGEQ.matrix_response = _mr_diag
Delay.matrix_response = _mr_full
parallelDelay.matrix_response = _mr_diag
GainDelay.matrix_response = _mr_full
parallelGainDelay.matrix_response = _mr_diag


class CachedResponse(Module):
    """Precomputed-response wrapper for FROZEN (non-trainable) modules.

    A module whose parameters never change during training still pays its
    full param->response computation inside every jitted step (XLA cannot
    constant-fold traced pytree leaves).  ``CachedResponse(module)``
    evaluates the response ONCE at wrap time and stores it as a leaf; the
    wrapped forward is just the per-bin contraction.  For the active-
    acoustics room (52 length-96000 rffts of measured IRs per step) this
    removes the dominant cost of the training step.

    The wrapper preserves the module protocol: __call__, matrix_response,
    probe on the rfft grid is NOT available (use the original module for
    arbitrary-z probing).

    The response is stored as SEPARATE re/im real leaves and recombined on
    use (one fused add per step): complex pytree leaves carried through
    lax.scan intermittently hit backend UNIMPLEMENTED on the tunneled TPU
    (CLAUDE.md), and real leaves dodge that entirely.
    """

    leaf_fields = ("H_re", "H_im")

    def __init__(self, module, ext_param=None):
        assert not getattr(module, "trainable", False), (
            "CachedResponse is for frozen modules; a trainable module's "
            "response must be recomputed from its parameters every step."
        )
        kind, H = module.matrix_response(ext_param) if ext_param is not None \
            else module.matrix_response()
        self.kind = kind
        self.H_re = jnp.real(H)
        self.H_im = jnp.imag(H)
        self.nfft = module.nfft
        self.M = module.nfft // 2 + 1
        self.alias_decay_db = module.alias_decay_db
        self.dtype = module.dtype
        self.input_channels = module.input_channels
        self.output_channels = module.output_channels
        self.trainable = False

    @property
    def H(self):
        return jax.lax.complex(self.H_re, self.H_im)

    def __call__(self, x, ext_param=None):
        from flamo_tpu.ops import linop

        # frozen by contract: stop_gradient prunes the (large) cotangent
        # computation for H from every backward pass
        return linop.apply(self.kind, jax.lax.stop_gradient(self.H), x)

    def matrix_response(self, ext_param=None):
        return self.kind, jax.lax.stop_gradient(self.H)
