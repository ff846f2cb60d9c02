"""Small utilities (counterpart of reference flamo/utils.py).

TPU notes: there is no device string threading here — arrays live where jit
puts them.  Randomness is explicit ``jax.random`` keys; :func:`set_seed` /
:func:`next_key` provide a torch-``manual_seed``-like convenience on top.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from flamo_tpu.core import complex_dtype_for

# ----------------------------------------------------------------------
# randomness: explicit keys with a seeded global fallback
# ----------------------------------------------------------------------
_GLOBAL_KEY = [jax.random.PRNGKey(0)]


def get_device():
    """Default accelerator device (API parity with reference
    flamo/utils.py:7-9; placement is otherwise implicit in JAX)."""
    return jax.devices()[0]


def set_seed(seed: int) -> None:
    """Seed the global key stream (UX counterpart of ``torch.manual_seed``)."""
    _GLOBAL_KEY[0] = jax.random.PRNGKey(int(seed))


def next_key(key=None) -> jax.Array:
    """Return ``key`` if given, else split one off the global stream."""
    if key is not None:
        return key
    _GLOBAL_KEY[0], sub = jax.random.split(_GLOBAL_KEY[0])
    return sub


from contextlib import contextmanager


@contextmanager
def host_eager():
    """Run eager (construction-time) math on the CPU backend.

    On remote-tunneled TPU backends every eager op pays a compile+transfer
    round trip; module construction is eager by design (precise errors), so
    build models under this context and let the jitted step move the pytree
    to the accelerator."""
    with jax.default_device(jax.devices("cpu")[0]):
        yield


_TRANSFER_CHUNK_BYTES = 4 * 1024 * 1024


def to_device(tree, device=None):
    """Transfer a pytree to ``device`` leaf-by-leaf via host numpy buffers,
    splitting large arrays into <=4 MB chunks.

    The axon-tunneled backend intermittently rejects large host->device
    transfers with UNIMPLEMENTED (and a failed transfer can wedge the
    client), while small transfers always succeed; chunking + on-device
    concatenation is reliable.  On healthy backends this is just a minor
    overhead at setup time."""
    if device is None:
        device = jax.devices()[0]

    def put(x):
        if not isinstance(x, (jax.Array, np.ndarray)):
            return x
        arr = np.asarray(x)
        if arr.nbytes <= _TRANSFER_CHUNK_BYTES or arr.ndim == 0:
            return jax.device_put(arr, device)
        rows_per_chunk = max(1, _TRANSFER_CHUNK_BYTES
                             // max(1, arr.nbytes // max(1, arr.shape[0])))
        parts = [jax.device_put(np.ascontiguousarray(
                     arr[i:i + rows_per_chunk]), device)
                 for i in range(0, arr.shape[0], rows_per_chunk)]
        return jnp.concatenate(parts, axis=0)

    return jax.tree_util.tree_map(put, tree)


def enable_x64(enable: bool = True) -> None:
    """Opt into float64 (the reference examples default to float64 on CPU;
    TPU is float32-native so x64 runs on the CPU backend of each op)."""
    jax.config.update("jax_enable_x64", bool(enable))


# ----------------------------------------------------------------------
# dtype / complex helpers
# ----------------------------------------------------------------------
def to_complex(x: jax.Array) -> jax.Array:
    """Real -> complex with zero imaginary part (reference flamo/utils.py:12-22)."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return x
    return x.astype(complex_dtype_for(x.dtype))


def get_frequency_samples(num: int, rho: float = 1.0, dtype=jnp.float32) -> jax.Array:
    """Points on the circle of radius ``rho``, angles in [0, pi]
    (reference flamo/utils.py:33-49; rho>1 probes outside the unit circle
    for alias-aware analysis)."""
    angle = jnp.linspace(0.0, 1.0, num, dtype=dtype)
    return rho * jnp.exp(1j * angle * jnp.pi)


# ----------------------------------------------------------------------
# audio IO (soundfile is not available in this image; WAV via scipy)
# ----------------------------------------------------------------------
def save_audio(filepath: str, x, fs: int = 48000, subtype: str = "PCM_24") -> None:
    """Write a WAV file (reference flamo/utils.py:25-30).

    ``subtype`` 'PCM_16'/'PCM_24'/'PCM_32' map to integer widths ('PCM_24'
    writes true 3-byte-per-sample PCM frames, matching soundfile's PCM_24
    — the reference's default); 'FLOAT' writes float32 samples.
    """
    folder = os.path.dirname(filepath)
    if folder and not os.path.exists(folder):
        os.makedirs(folder)
    x = np.asarray(x)
    if subtype == "FLOAT":
        from scipy.io import wavfile

        wavfile.write(filepath, int(fs), x.astype(np.float32))
        return
    peak = np.max(np.abs(x)) if x.size else 1.0
    if peak > 1.0:
        x = x / peak
    if subtype == "PCM_16":
        from scipy.io import wavfile

        wavfile.write(filepath, int(fs), (x * (2**15 - 1)).astype(np.int16))
    elif subtype == "PCM_32":
        from scipy.io import wavfile

        wavfile.write(filepath, int(fs),
                      (x * (2**31 - 1)).astype(np.int32))
    else:  # PCM_24: true 3-byte little-endian frames via stdlib wave
        import wave

        if x.ndim == 1:
            x = x[:, None]
        q = np.clip(np.round(x * (2**23 - 1)), -(2**23), 2**23 - 1)
        i4 = q.astype("<i4")  # interleaved (T, C) int32
        raw = i4.tobytes()
        # keep the 3 low bytes of each little-endian int32 sample
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 4)[:, :3]
        with wave.open(filepath, "wb") as w:
            w.setnchannels(x.shape[1])
            w.setsampwidth(3)
            w.setframerate(int(fs))
            w.writeframes(b.tobytes())


def load_audio(filepath: str):
    """Read a WAV file -> (float32 array in [-1,1] of shape (T, C), fs).

    Handles 24-bit PCM (3-byte frames) natively; other formats go through
    scipy."""
    import wave

    try:
        with wave.open(filepath, "rb") as w:
            if w.getsampwidth() == 3:
                C = w.getnchannels()
                fs = w.getframerate()
                raw = w.readframes(w.getnframes())
                b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
                val = (b[:, 0].astype(np.int32)
                       | (b[:, 1].astype(np.int32) << 8)
                       | (b[:, 2].astype(np.int32) << 16))
                val = np.where(val >= 2**23, val - 2**24, val)
                data = (val.astype(np.float32) / 2**23).reshape(-1, C)
                return data, fs
    except wave.Error:
        pass  # compressed / float WAVs: scipy below
    from scipy.io import wavfile

    fs, data = wavfile.read(filepath)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 2**15
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2**31
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 1:
        data = data[:, None]
    return data, fs


# ----------------------------------------------------------------------
# differentiable regular-grid interpolation (reference flamo/utils.py:51-121)
# ----------------------------------------------------------------------
class RegularGridInterpolator:
    """Multilinear interpolation on a regular grid, differentiable in values.

    Same semantics as the reference implementation (bucketize + corner
    blending); points are 1-D grids per dimension.
    """

    def __init__(self, points, values):
        assert isinstance(points, (tuple, list))
        self.points = [jnp.asarray(p) for p in points]
        self.values = jnp.asarray(values)
        self.n = len(self.points)
        assert self.values.ndim == self.n
        for i, p in enumerate(self.points):
            assert p.shape[0] == self.values.shape[i]

    def __call__(self, points_to_interp):
        assert len(points_to_interp) == self.n
        xs = [jnp.asarray(x) for x in points_to_interp]
        idxs, dists, overalls = [], [], []
        for p, x in zip(self.points, xs):
            idx_right = jnp.searchsorted(p, x, side="right")
            idx_right = jnp.clip(idx_right, 0, p.shape[0] - 1)
            idx_left = jnp.clip(idx_right - 1, 0, p.shape[0] - 1)
            dist_left = jnp.maximum(x - p[idx_left], 0.0)
            dist_right = jnp.maximum(p[idx_right] - x, 0.0)
            both_zero = (dist_left == 0) & (dist_right == 0)
            dist_left = jnp.where(both_zero, 1.0, dist_left)
            dist_right = jnp.where(both_zero, 1.0, dist_right)
            idxs.append((idx_left, idx_right))
            dists.append((dist_left, dist_right))
            overalls.append(dist_left + dist_right)

        from itertools import product

        numerator = 0.0
        for indexer in product([0, 1], repeat=self.n):
            as_s = tuple(idx[onoff] for onoff, idx in zip(indexer, idxs))
            bs_s = [dist[1 - onoff] for onoff, dist in zip(indexer, dists)]
            numerator = numerator + self.values[as_s] * jnp.prod(
                jnp.stack(bs_s), axis=0
            )
        denominator = jnp.prod(jnp.stack(overalls), axis=0)
        return numerator / denominator
