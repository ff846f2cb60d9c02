"""Paraunitary scattering matrices for FDNs (counterpart of reference
flamo/auxiliary/scattering.py; Schlecht & Habets, 'Scattering in Feedback
Delay Networks').

TPU-first redesign: the reference builds the polynomial matrix with
data-dependent padding and a triple Python loop over ``conv1d``
(scattering.py:156-218) — unjittable and slow.  Here the random shifts are
drawn once at construction and kept STATIC, so every stage is a fixed-shape
roll + einsum; the stage products are order-0 x order-L polynomial products,
i.e. plain matmuls over the tap axis (MXU-friendly).  The generic
:func:`poly_matrix_conv` is provided via FFT-domain products.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from flamo_tpu.utils import next_key, to_complex


def hadamard_matrix(N: int):
    """Normalized Hadamard matrix (numpy) (reference scattering.py:243-253)."""
    X = np.array([[1.0]])
    while X.shape[0] < N:
        X = np.kron(X, np.array([[1.0, 1.0], [1.0, -1.0]])) / np.sqrt(2)
    return X


def shift_mat_distribute(X, sparsity: int, pulse_size: int, key=None):
    """Non-overlapping random shifts for one stage
    (reference scattering.py:221-228)."""
    N = np.asarray(X).shape[0]
    rand = np.asarray(jax.random.uniform(next_key(key), (N,)))
    rand_shift = np.floor(sparsity * (np.arange(N) + rand * 0.99))
    return (rand_shift * pulse_size).astype(np.int64)


def get_random_shifts(N: int, sparsity_vect, pulse_size: int = 1, key=None):
    """Random non-overlapping integer shifts per stage
    (reference scattering.py:225-240).  Returns an int numpy array
    (n_stages, N) — static by design."""
    key = next_key(key)
    sparsity_vect = np.asarray(sparsity_vect, dtype=np.float64)
    n_stages = sparsity_vect.shape[0]
    rand = np.asarray(jax.random.uniform(key, (n_stages, N)))
    shifts = np.zeros((n_stages, N), dtype=np.int64)
    ps = float(pulse_size)
    for k in range(n_stages):
        temp = np.floor(sparsity_vect[k] * (np.arange(N) + rand[k] * 0.99))
        shifts[k, :] = (temp * ps).astype(np.int64)
        ps = ps * N * sparsity_vect[k]
    return shifts


def shift_matrix_static(X, shift, direction: str = "left"):
    """Delay rows (left) or columns (right) of a polynomial matrix
    (N, N, T) by STATIC integer shifts; zero-pads to the exact needed
    length (reference scattering.py:190-218, made static-shape)."""
    shift = [int(s) for s in np.asarray(shift).reshape(-1)]
    N = X.shape[0]
    if X.ndim == 2:
        X = X[:, :, None]
    extra = max(shift)
    if extra > 0:
        X = jnp.pad(X, ((0, 0), (0, 0), (0, extra)))
    rows = []
    if direction.lower() == "left":
        for i in range(N):
            rows.append(jnp.roll(X[i], shift[i], axis=-1))
        return jnp.stack(rows, axis=0)
    else:
        cols = []
        for j in range(N):
            cols.append(jnp.roll(X[:, j], shift[j], axis=-1))
        return jnp.stack(cols, axis=1)


# reference name (scattering.py:190-218); the TPU rewrite requires static
# shifts, hence the canonical `_static` name — this alias keeps migrating
# code working unchanged.
shift_matrix = shift_matrix_static


def poly_matrix_conv(A, B):
    """Polynomial matrix product C(z) = A(z) B(z) via FFT-domain matmuls
    (replaces the reference's triple conv1d loop, scattering.py:156-187).

    A: (Na, K, Ta) or (Na, K); B: (K, Nb, Tb) or (K, Nb).
    Returns (Na, Nb, Ta+Tb-1)."""
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    if A.ndim == 2:
        A = A[:, :, None]
    if B.ndim == 2:
        B = B[:, :, None]
    if A.shape[1] != B.shape[0]:
        raise ValueError("Invalid matrix dimension.")
    Tc = A.shape[2] + B.shape[2] - 1
    nfft = 1 << max(1, (Tc - 1).bit_length())
    Af = jnp.fft.rfft(A, n=nfft, axis=2)          # (Na, K, F)
    Bf = jnp.fft.rfft(B, n=nfft, axis=2)          # (K, Nb, F)
    Cf = jnp.einsum("ikf,kjf->ijf", Af, Bf)
    C = jnp.fft.irfft(Cf, n=nfft, axis=2)[..., :Tc]
    return C


class ScatteringMapping:
    """Orthogonal -> paraunitary map via sparse scattering
    (reference scattering.py:7-94).

    U (K+1, N, N) orthogonal stages -> V (T, N, N) FIR filter matrix:
    per stage ``V <- (U_k diag(g^shift)) * shift(V)`` with random
    non-overlapping static shifts, then final m_L / m_R shifts.

    Static + hashable so it can live as module configuration; jittable in U.
    """

    def __init__(self, N: int, n_stages: int = 3, sparsity: int = 3,
                 gain_per_sample: float = 0.9999, pulse_size: int = 1,
                 m_L=None, m_R=None, dtype=jnp.float32, key=None):
        self.N = N
        self.n_stages = n_stages
        self.sparsity = sparsity
        self.gain_per_sample = float(gain_per_sample)
        self.pulse_size = pulse_size
        self.dtype = jnp.dtype(dtype)
        m_L = np.zeros(N, dtype=np.int64) if m_L is None else \
            np.asarray(m_L, dtype=np.int64)
        m_R = np.zeros(N, dtype=np.int64) if m_R is None else \
            np.asarray(m_R, dtype=np.int64)
        self.m_L = tuple(int(v) for v in m_L)
        self.m_R = tuple(int(v) for v in m_R)
        sparsity_vect = np.ones(n_stages)
        if n_stages > 0:
            sparsity_vect[0] = sparsity
        shifts = get_random_shifts(N, sparsity_vect, pulse_size, key=key)
        self.shifts = tuple(tuple(int(v) for v in row) for row in shifts)

    @property
    def output_length(self) -> int:
        """Total FIR length (reference dsp.py:1170-1174)."""
        total = 0
        if self.shifts:
            total = int(np.asarray(self.shifts).sum(axis=0).max())
        return total + 1 + max(self.m_L) + max(self.m_R)

    def __call__(self, U):
        """U (K+1, N, N) -> V (T, N, N)."""
        K = self.n_stages + 1
        assert U.shape[0] == K, "The input matrix must have n_stages+1 stages"
        assert U.shape[1] == U.shape[2], "The input matrix must be square"
        V = U[0][:, :, None]  # (N, N, 1)
        for k in range(1, K):
            shift = np.asarray(self.shifts[k - 1])
            G = jnp.diag(jnp.asarray(
                self.gain_per_sample ** shift, dtype=self.dtype))
            R = U[k] @ G
            V = shift_matrix_static(V, shift, direction="left")
            # order-0 polynomial product: matmul over channels per tap
            V = jnp.einsum("ik,kjt->ijt", R, V)
        V = shift_matrix_static(V, self.m_L, direction="left")
        V = shift_matrix_static(V, self.m_R, direction="right")
        return jnp.transpose(V, (2, 0, 1))  # (T, N, N)

    def __hash__(self):
        return hash((self.N, self.n_stages, self.sparsity,
                     self.gain_per_sample, self.pulse_size, self.m_L,
                     self.m_R, self.shifts, str(self.dtype)))

    def __eq__(self, other):
        return (isinstance(other, ScatteringMapping)
                and self.__hash__() == other.__hash__())


def cascaded_paraunit_matrix(U, n_stages: int = 3, gain_per_sample=0.9999,
                             sparsity: int = 3, pulse_size: int = 1,
                             m_L=None, m_R=None, dtype=jnp.float32, key=None):
    """Functional twin of :class:`ScatteringMapping`
    (reference scattering.py:97-153).  Returns complex (T, N, N)."""
    N = U.shape[-1]
    mapping = ScatteringMapping(N, n_stages=n_stages, sparsity=sparsity,
                                gain_per_sample=gain_per_sample,
                                pulse_size=pulse_size, m_L=m_L, m_R=m_R,
                                dtype=dtype, key=key)
    return to_complex(mapping(U))
