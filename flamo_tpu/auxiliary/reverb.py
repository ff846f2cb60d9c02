"""FDN reverb model factories and attenuation filters (counterpart of
reference flamo/auxiliary/reverb.py, 887 LoC).

:class:`HomogeneousFDN` assembles the canonical FDN: input/output Gains,
``parallelDelay`` lines with coprime lengths, an orthogonal ``Matrix``
feedback, homogeneous ``parallelGain`` attenuation through :class:`map_gamma`,
all inside ``Recursion``/``Series``/``Shell``.  The attenuation-filter
family (GEQ / accurate GEQ / PEQ / first-order shelving, scaled by delay
lengths) mirrors the reference classes one for one.
"""

from __future__ import annotations

import math
from collections import OrderedDict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from flamo_tpu.processor import dsp, system
from flamo_tpu.processor.dsp import (Filter, _identity, _iir_eps_guard,
                                      _iir_guard_prods)
from flamo_tpu.functional import cascade_prods, poly_response
from flamo_tpu.utils import next_key
from flamo_tpu.auxiliary.eq import accurate_geq, geq


def rt2slope(rt60, fs: int):
    """RT60 seconds -> energy decay slope in dB/sample (reference reverb.py:17-22)."""
    return -60 / (jnp.asarray(rt60) * fs)


def rt2absorption(rt60, fs: int, delays_len):
    """RT60 -> dB decay per delay-line pass (reference reverb.py:25-29)."""
    slope = rt2slope(rt60, fs)
    return jnp.einsum("i,j->ij", jnp.atleast_1d(slope),
                      jnp.asarray(delays_len))


class map_gamma:
    """Sigmoid-compressed per-delay-line attenuation map gamma^{d_i}
    (reference reverb.py:31-46); g in [0.99, 1]."""

    g_min, g_max = 0.99, 1.0

    def __init__(self, delays, is_compressed: bool = True):
        self.delays = tuple(int(d) for d in np.asarray(delays).reshape(-1))
        self.is_compressed = is_compressed

    def __call__(self, x):
        d = jnp.asarray(self.delays, dtype=jnp.result_type(x))
        if self.is_compressed:
            return (jax.nn.sigmoid(x[0]) * (self.g_max - self.g_min)
                    + self.g_min) ** d
        return x[0] ** d

    def __hash__(self):
        return hash(("map_gamma", self.delays, self.is_compressed))

    def __eq__(self, other):
        return (isinstance(other, map_gamma)
                and other.delays == self.delays
                and other.is_compressed == self.is_compressed)


class inverse_map_gamma:
    """Inverse of :class:`map_gamma` (reference reverb.py:48-69)."""

    g_min, g_max = 0.99, 1.0

    def __init__(self, delays=None, is_compressed: bool = True):
        self.delays = None if delays is None else tuple(
            int(d) for d in np.asarray(delays).reshape(-1))
        self.is_compressed = is_compressed

    def __call__(self, y):
        y = jnp.asarray(y)
        if self.is_compressed:
            if self.delays is None:
                sig = (y - self.g_min) / (self.g_max - self.g_min)
            else:
                d = jnp.asarray(self.delays, dtype=y.dtype)
                sig = (y ** (1 / d) - self.g_min) / (self.g_max - self.g_min)
            return jnp.log(sig / (1 - sig))
        if self.delays is None:
            return y
        d = jnp.asarray(self.delays, dtype=y.dtype)
        return y ** (1 / d)


class map_gfdn_gamma:
    """Grouped-FDN attenuation map (reference reverb.py:71-81)."""

    def __init__(self, delays, n_groups: int, fs: int):
        self.delays = tuple(int(d) for d in np.asarray(delays).reshape(-1))
        self.n_groups = n_groups
        self.fs = fs

    def __call__(self, x):
        d = jnp.asarray(self.delays, dtype=jnp.result_type(x))
        return rt2slope(x, self.fs)[..., None] * d[None, :]

    def __hash__(self):
        return hash(("map_gfdn_gamma", self.delays, self.n_groups, self.fs))

    def __eq__(self, other):
        return (isinstance(other, map_gfdn_gamma)
                and (other.delays, other.n_groups, other.fs)
                == (self.delays, self.n_groups, self.fs))


def coprime_delay_lengths(N: int, delay_range_ms, sample_rate: int,
                          rng: Optional[np.random.Generator] = None):
    """Coprime (prime) delay-line lengths in a ms range
    (reference reverb.py:206-223 / config.py:45-57)."""
    import sympy as sp

    rng = rng or np.random.default_rng()
    lo, hi = (np.round(np.asarray(delay_range_ms) * sample_rate / 1000)
              .astype(int))
    primes = np.array(list(sp.primerange(lo, hi)), dtype=np.int32)
    rand_primes = primes[rng.permutation(len(primes))]
    return np.r_[rand_primes[:N - 1],
                 int(sp.nextprime(hi))].astype(np.int32).tolist()


class HomogeneousFDN:
    """Feedback Delay Network with homogeneous attenuation
    (reference reverb.py:83-300).

    Build from a :class:`flamo_tpu.auxiliary.config.HomogeneousFDNConfig`.
    The model is a Shell(Series(input_gain, Recursion(delays+attenuation,
    orthogonal matrix), output_gain)).
    """

    def __init__(self, config_dict, key=None):
        self.config_dict = config_dict
        self.N = config_dict.N
        self.delays = config_dict.delays
        self.key = next_key(key)
        self.fdn = self.get_fdn_instance()
        self.set_model()

    def set_model(self, input_layer=None, output_layer=None):
        if input_layer is None:
            input_layer = dsp.FFT(self.config_dict.nfft,
                                  dtype=self.config_dict.dtype)
        if output_layer is None:
            output_layer = dsp.iFFTAntiAlias(
                nfft=self.config_dict.nfft,
                alias_decay_db=self.config_dict.alias_decay_db,
                dtype=self.config_dict.dtype,
            )
        self.model = self.get_shell(input_layer, output_layer)

    def get_fdn_instance(self):
        cfg = self.config_dict
        delay_lines = jnp.asarray(self.delays)
        keys = jax.random.split(self.key, 4)

        input_gain = dsp.Gain(
            size=(self.N, 1), nfft=cfg.nfft,
            requires_grad=cfg.input_gain_grad,
            alias_decay_db=cfg.alias_decay_db, dtype=cfg.dtype, key=keys[0])
        output_gain = dsp.Gain(
            size=(1, self.N), nfft=cfg.nfft,
            requires_grad=cfg.output_gain_grad,
            alias_decay_db=cfg.alias_decay_db, dtype=cfg.dtype, key=keys[1])

        delays = dsp.parallelDelay(
            size=(self.N,), max_len=int(max(self.delays)), nfft=cfg.nfft,
            isint=cfg.is_delay_int, requires_grad=cfg.delays_grad,
            alias_decay_db=cfg.alias_decay_db, dtype=cfg.dtype, key=keys[2])
        delays = delays.assign_value(delays.sample2s(delay_lines))

        mixing_matrix = dsp.Matrix(
            size=(self.N, self.N), nfft=cfg.nfft, matrix_type="orthogonal",
            requires_grad=cfg.mixing_matrix_grad,
            alias_decay_db=cfg.alias_decay_db, dtype=cfg.dtype, key=keys[3])

        attenuation = dsp.parallelGain(
            size=(self.N,), nfft=cfg.nfft,
            requires_grad=cfg.attenuation_grad,
            alias_decay_db=cfg.alias_decay_db, dtype=cfg.dtype)
        attenuation = attenuation.replace(map=map_gamma(delay_lines))
        attenuation = attenuation.assign_value(
            6 * jnp.ones((self.N,), dtype=cfg.dtype))

        feedforward = system.Series(
            OrderedDict({"delays": delays, "attenuation": attenuation}))
        feedback_loop = system.Recursion(
            fF=feedforward, fB=mixing_matrix,
            solve_method=getattr(cfg, "solve_method", "ge"))
        return system.Series(OrderedDict({
            "input_gain": input_gain,
            "feedback_loop": feedback_loop,
            "output_gain": output_gain,
        }))

    def get_shell(self, input_layer, output_layer):
        return system.Shell(core=self.fdn, input_layer=input_layer,
                            output_layer=output_layer)

    def get_delay_lines(self):
        """Coprime delay lengths for the configured range
        (reference reverb.py:206-223)."""
        return coprime_delay_lengths(self.N, self.config_dict.delay_range_ms,
                                     self.config_dict.sample_rate)

    def get_raw_parameters(self):
        """Raw FDN parameters as numpy (reference reverb.py:225-237)."""
        core = self.model.get_core()
        return {
            "A": np.asarray(core.feedback_loop.feedback.param),
            "attenuation": np.asarray(
                core.feedback_loop.feedforward.attenuation.param),
            "B": np.asarray(core.input_gain.param),
            "C": np.asarray(core.output_gain.param),
            "m": np.asarray(core.feedback_loop.feedforward.delays.param),
        }

    def set_raw_parameters(self, param: dict):
        """Set raw parameters from a dict (reference reverb.py:239-259);
        functional: rebuilds the model pytree."""
        core = self.model.get_core()
        fb_loop = core.feedback_loop
        ff = fb_loop.feedforward
        for key, value in param.items():
            v = jnp.asarray(value)
            if key == "A":
                fb_loop = fb_loop.replace(
                    feedback=fb_loop.feedback.assign_value(v))
            elif key == "attenuation":
                ff = ff.replace(modules=(
                    ff.modules[0],
                    ff.modules[1].assign_value(v.squeeze())))
            elif key == "B":
                core = core.replace(modules=tuple(
                    m.assign_value(v) if k == "input_gain" else m
                    for k, m in zip(core.keys, core.modules)))
            elif key == "C":
                core = core.replace(modules=tuple(
                    m.assign_value(v) if k == "output_gain" else m
                    for k, m in zip(core.keys, core.modules)))
            elif key == "m":
                ff = ff.replace(modules=(
                    ff.modules[0].assign_value(v.squeeze()),
                    ff.modules[1]))
        fb_loop = fb_loop.replace(feedforward=ff)
        core = core.replace(modules=tuple(
            fb_loop if k == "feedback_loop" else m
            for k, m in zip(core.keys, core.modules)))
        self.model = self.model.set_core(core)
        self.fdn = core

    def normalize_energy(self, target_energy=1):
        """Frequency-domain energy normalization of in/out gains
        (reference reverb.py:261-293)."""
        H = self.model.get_freq_response(identity=False)
        energy_H = jnp.mean(jnp.abs(H) ** 2)

        core = self.model.get_core()
        scale = (energy_H / target_energy) ** (1 / 4)
        core = core.replace(modules=tuple(
            m.assign_value(m.param / scale)
            if k in ("input_gain", "output_gain") else m
            for k, m in zip(core.keys, core.modules)))
        self.model = self.model.set_core(core)
        self.fdn = core

        H = self.model.get_freq_response(identity=False)
        energy_H = jnp.mean(jnp.abs(H) ** 2)
        assert abs(energy_H - target_energy) / target_energy < 1e-4, \
            "Energy normalization failed"

    def rt2gain(self, rt60):
        gdB = rt2absorption(rt60, self.config_dict.sample_rate,
                            jnp.asarray(self.delays)).squeeze()
        return 10 ** (gdB / 20)


# ---------------------------------------------------------------------------
# delay-scaled attenuation filters
# ---------------------------------------------------------------------------


class parallelFDNAccurateGEQ(dsp.parallelAccurateGEQ):
    """Attenuation accurate-GEQ scaled by delay lengths; params are RT60
    seconds (reference reverb.py:303-391).  Non-learnable; design cached at
    construction (see AccurateGEQ)."""

    def __init__(self, octave_interval=1, nfft=2**11, fs=48000, delays=None,
                 alias_decay_db=0.0, start_freq=31.25, end_freq=16000.0,
                 dtype=jnp.float32, key=None):
        assert delays is not None, "Delays must be provided"
        self.delays = tuple(int(d) for d in np.asarray(delays).reshape(-1))
        d = jnp.asarray(self.delays, dtype=dtype)
        map = _RTScaledMap(self.delays, fs)
        # size () in the reference; our param is the (n_gains,) RT60 vector
        super().__init__(size=(), octave_interval=octave_interval, nfft=nfft,
                         fs=fs, map=map, alias_decay_db=alias_decay_db,
                         start_freq=start_freq, end_freq=end_freq,
                         dtype=dtype, key=key)

    def check_param_shape(self):
        assert len(self.size) == 1, (
            "The parameter should contain only the command gains"
        )

    def get_io(self):
        self.input_channels = len(self.delays)
        self.output_channels = len(self.delays)

    def init_param(self, key):
        # reference inherits U(db2mag(-6), db2mag(6)) init on RT60s
        self.size = (self.n_gains,)
        return jax.random.uniform(key, self.size, dtype=self.dtype,
                                  minval=10 ** (-6 / 20),
                                  maxval=10 ** (6 / 20))

    def _design_cache(self):
        target = np.asarray(self.map(self.param))  # (n_gains, N) dB
        bs, as_ = [], []
        for i in range(target.shape[1]):
            b, a = accurate_geq(
                target_gain=target[:, i],
                center_freq=np.asarray(self.center_freq),
                shelving_crossover=np.asarray(self.shelving_crossover),
                fs=self.fs)
            bs.append(np.asarray(b))
            as_.append(np.asarray(a))
        self.sos_b = jnp.asarray(np.stack(bs, axis=-1), dtype=self.dtype)
        self.sos_a = jnp.asarray(np.stack(as_, axis=-1), dtype=self.dtype)


class _RTScaledMap:
    """RT60 (seconds) -> per-delay-line dB gains (reference reverb.py:342)."""

    def __init__(self, delays: tuple, fs: int):
        self.delays = delays
        self.fs = fs

    def __call__(self, x):
        d = jnp.asarray(self.delays, dtype=jnp.result_type(x))
        return rt2slope(x, self.fs)[..., None] * d[None, :]

    def __hash__(self):
        return hash(("_RTScaledMap", self.delays, self.fs))

    def __eq__(self, other):
        return (isinstance(other, _RTScaledMap)
                and (other.delays, other.fs) == (self.delays, self.fs))


class parallelGFDNAccurateGEQ(parallelFDNAccurateGEQ):
    """Grouped (multi-slope) accurate GEQ (reference reverb.py:393-457)."""

    def __init__(self, octave_interval=1, n_groups=2, nfft=2**11, fs=48000,
                 delays=None, alias_decay_db=0.0, start_freq=31.25,
                 end_freq=16000.0, dtype=jnp.float32, key=None):
        assert delays is not None, "Delays must be provided"
        self.n_groups = n_groups
        super().__init__(octave_interval=octave_interval, nfft=nfft, fs=fs,
                         delays=delays, alias_decay_db=alias_decay_db,
                         start_freq=start_freq, end_freq=end_freq,
                         dtype=dtype, key=key)
        # re-dimension: n_groups stacked RT vectors
        base_gains = self.n_gains
        self.size = (self.n_groups * base_gains,)
        self.param = jax.random.uniform(next_key(None), self.size,
                                        dtype=self.dtype,
                                        minval=10 ** (-6 / 20),
                                        maxval=10 ** (6 / 20))
        self.map = map_gfdn_gamma(self.delays, self.n_groups, fs)
        self._design_cache()

    def _design_cache(self):
        if not isinstance(self.map, map_gfdn_gamma):
            # called from the base constructor before the grouped
            # re-dimensioning — run the ungrouped design on the interim param
            return parallelFDNAccurateGEQ._design_cache(self)
        n_gains = self.size[0] // self.n_groups
        target = np.asarray(self.map(self.param))  # (G*n_gains, N)
        bs, as_ = [], []
        for i in range(target.shape[1]):
            gb, ga = [], []
            for g in range(self.n_groups):
                b, a = accurate_geq(
                    target_gain=target[g * n_gains:(g + 1) * n_gains, i],
                    center_freq=np.asarray(self.center_freq),
                    shelving_crossover=np.asarray(self.shelving_crossover),
                    fs=self.fs)
                gb.append(np.asarray(b))
                ga.append(np.asarray(a))
            bs.append(np.concatenate(gb, axis=1))
            as_.append(np.concatenate(ga, axis=1))
        self.sos_b = jnp.asarray(np.stack(bs, axis=-1), dtype=self.dtype)
        self.sos_a = jnp.asarray(np.stack(as_, axis=-1), dtype=self.dtype)


class parallelFDNGEQ(dsp.parallelGEQ):
    """Trainable delay-scaled attenuation GEQ; params are RT60 seconds
    (reference reverb.py:459-552)."""

    def __init__(self, octave_interval=1, nfft=2**11, fs=48000, delays=None,
                 requires_grad=False, alias_decay_db=0.0, dtype=jnp.float32,
                 key=None):
        assert delays is not None, "Delays must be provided"
        self.delays = tuple(int(d) for d in np.asarray(delays).reshape(-1))
        super().__init__(size=(), octave_interval=octave_interval, nfft=nfft,
                         fs=fs, map=_identity, requires_grad=requires_grad,
                         alias_decay_db=alias_decay_db, dtype=dtype, key=key)

    def check_param_shape(self):
        assert len(self.size) == 1, (
            "The parameter should contain only the command gains"
        )

    def get_io(self):
        self.input_channels = len(self.delays)
        self.output_channels = len(self.delays)

    def init_param(self, key):
        self.size = (self.n_gains,)
        return jax.random.uniform(key, self.size, dtype=self.dtype,
                                  minval=1.0, maxval=3.0)

    def _envelope_coeffs(self, param):
        """Per-delay-line GEQ SOS with the alias envelope folded in:
        (b3, a3), each (3, bands, N) — shared by the rfft-grid response
        and arbitrary-z probing (reference reverb.py:515-537)."""
        cf = jnp.asarray(self.center_freq, dtype=self.dtype)
        sf = jnp.asarray(self.shelving_crossover, dtype=self.dtype)
        R = jnp.asarray(2.7, dtype=self.dtype)
        d = jnp.asarray(self.delays, dtype=self.dtype)
        gains = rt2slope(param, self.fs)[:, None] * d[None, :]  # (K, N)

        def one(g):
            return geq(center_freq=cf, shelving_freq=sf, R=R, gain_db=g,
                       fs=self.fs, dtype=self.dtype)

        b, a = jax.vmap(one, in_axes=1, out_axes=2)(gains)  # (3, bands, N)
        env = (jnp.asarray(self.gamma, self.dtype)
               ** jnp.arange(3, dtype=self.dtype))
        env = env.reshape((3, 1, 1))
        return b * env, a * env

    def get_poly_coeff(self, param):
        b3, a3 = self._envelope_coeffs(param)
        B = poly_response(b3, self.nfft)
        A = poly_response(a3, self.nfft)
        return _iir_guard_prods(*cascade_prods(b3, a3, self.nfft)), B, A

    def response(self, ext_param=None):
        return self.get_poly_coeff(self.map(self._raw(ext_param)))[0]

    def probe(self, z):
        """diag of the per-line RT-scaled GEQ response at arbitrary z (the
        reference probe protocol, dsp.py:343-352).  The inherited GEQ probe
        would re-run the band design on the raw RT60 params without the
        delay scaling — this one shares `_envelope_coeffs` with the
        response path."""
        b3, a3 = self._envelope_coeffs(self.map(self.param))
        zk = (jnp.asarray(z).astype(self.cdtype)
              ** (-jnp.arange(3, dtype=self.dtype))).reshape(3, 1, 1)
        num = jnp.sum(b3.astype(self.cdtype) * zk, axis=0)  # (bands, N)
        den = jnp.sum(a3.astype(self.cdtype) * zk, axis=0)
        return jnp.diag(jnp.prod(num / den, axis=0))


class parallelFDNPEQ(Filter):
    """Trainable attenuation PEQ scaled by delay lengths
    (reference reverb.py:554-805).  Supports ``is_twostage`` (extra global
    shelf) and ``is_proportional`` (single filter scaled per delay),
    'biquad' or 'svf' designs with the reference's sigmoid maps."""

    def __init__(self, n_bands=10, f_min=20.0, f_max=20000.0, delays=None,
                 design="biquad", is_twostage=False, is_proportional=False,
                 nfft=2**11, fs=48000, map=_identity, requires_grad=False,
                 alias_decay_db=0.0, dtype=jnp.float32, key=None):
        assert delays is not None, "Delays must be provided"
        assert design in ("biquad", "svf")
        self.delays = tuple(int(d) for d in np.asarray(delays).reshape(-1))
        self.is_twostage = bool(is_twostage)
        self.is_proportional = bool(is_proportional)
        self.n_bands = n_bands
        self.design = design
        self.fs = fs
        self.f_min = float(f_min)
        self.f_max = float(f_max)
        k = np.arange(1, n_bands + 1, dtype=np.float64)
        self.center_freq_bias = tuple(
            float(v)
            for v in f_min * (f_max / f_min) ** ((k - 1) / (n_bands - 1)))
        n_rows = n_bands + 1 if is_twostage else n_bands
        n_cols = 1 if is_proportional else len(self.delays)
        super().__init__(size=(n_rows, 3, n_cols), nfft=nfft, map=map,
                         requires_grad=requires_grad,
                         alias_decay_db=alias_decay_db, dtype=dtype, key=key)

    def init_param(self, key):
        return jax.random.uniform(key, self.size, dtype=self.dtype)

    def check_param_shape(self):
        assert len(self.size) == 3, (
            "Filter must be 2D in the parallel configuration, for 3D filters "
            "use PEQ module."
        )

    def get_io(self):
        self.input_channels = len(self.delays)
        self.output_channels = len(self.delays)

    # -- maps (reference reverb.py:722-769) --------------------------------
    def map_eq(self, param, is_twostage=False):
        bias_f = jnp.asarray(self.center_freq_bias, dtype=self.dtype)
        if self.design == "biquad" and not is_twostage:
            bias = bias_f / self.fs * 2 * jnp.pi
            min_f = 2 * jnp.pi * self.f_min / self.fs
            max_f = 2 * jnp.pi * self.f_max / self.fs
            spread = 2 ** jnp.linspace(self.n_bands, 0, self.n_bands,
                                       dtype=self.dtype)[:, None]
            f = jnp.clip(jax.nn.sigmoid(param[:, 0] - 0.5) / spread
                         + bias[:, None], min_f, max_f)
            R = jnp.zeros_like(param[:, 1])
            R = R.at[0].set(0.1 + jax.nn.sigmoid(R[0]) * 0.9)
            R = R.at[-1].set(0.1 + jax.nn.sigmoid(R[-1]) * 0.9)
            R = R.at[1:-1].set(0.1 + jax.nn.sigmoid(R[1:-1]) * 3)
            G = -1e-6 + jax.nn.sigmoid(param[:, 2] - 0.5) * (-5.0)
        elif self.design == "svf" and not is_twostage:
            w = 2 * bias_f / self.fs
            bias = jnp.log(w / (1 - w))[:, None]
            f = jnp.tan(jnp.pi * jax.nn.sigmoid(param[:, 0] + bias) * 0.5)
            R = jax.nn.softplus(param[:, 1]) / jnp.log(
                jnp.asarray(2.0, self.dtype))
            G = 10 ** (-jax.nn.softplus(param[:, 2] - 0.5)
                       / jnp.log(jnp.asarray(2.0, self.dtype))) - 10
        else:  # two-stage shelf (either design)
            bias = jnp.asarray(jnp.pi / 3, dtype=self.dtype)
            f = jax.nn.sigmoid(param[0]) / self.n_bands + bias
            R = jnp.zeros_like(param[1])
            R = 0.1 + jax.nn.sigmoid(R) * 0.9
            G = -1e-6 + jax.nn.sigmoid(param[2] - 0.5) * (-30.0)
        return jnp.stack([f, R, G])

    def compute_biquad_coeff(self, f, R, G, type="peaking"):
        # shared coefficient math with PEQ (reference reverb.py:668-720)
        peq = dsp.PEQ.__new__(dsp.PEQ)
        peq.design = self.design
        return dsp.PEQ.compute_biquad_coeff(peq, f, R, G, type)

    def _envelope_coeffs(self, param):
        """Per-section biquad coefficients with the alias envelope folded
        in: (b3, a3), each (3, rows, N) — shared by the rfft-grid response
        and arbitrary-z probing."""
        if self.is_twostage:
            param_eq = self.map_eq(param[:-1])
            param_ls = self.map_eq(param[-1], is_twostage=True)
        else:
            param_eq = self.map_eq(param)

        d = jnp.asarray(self.delays, dtype=self.dtype)
        n_delays = len(self.delays)
        nb = self.n_bands

        if self.is_proportional:
            f = jnp.broadcast_to(param_eq[0, :, 0:1], (nb, n_delays))
            R = jnp.broadcast_to(param_eq[1, :, 0:1], (nb, n_delays))
            G = param_eq[2, :, 0:1] * d[None, :]
        else:
            f, R, G = param_eq[0], param_eq[1], param_eq[2]

        sqrt_half = jnp.sqrt(jnp.asarray(0.5, self.dtype))

        def R_shelf(r):
            return r if self.design == "biquad" else r + sqrt_half

        # NOTE: the reference assigns band 0 a *highshelf* and band nb-1 a
        # *lowshelf* (reverb.py:631-644) — kept as-is for parity.
        a0, b0 = self.compute_biquad_coeff(f[0], R_shelf(R[0]), G[0],
                                           "highshelf")
        a_hi, b_hi = self.compute_biquad_coeff(f[nb - 1], R_shelf(R[nb - 1]),
                                               G[nb - 1], "lowshelf")
        a_pk, b_pk = self.compute_biquad_coeff(f[1:nb - 1], R[1:nb - 1],
                                               G[1:nb - 1], "peaking")
        rows_a = [a0[None], a_pk, a_hi[None]]
        rows_b = [b0[None], b_pk, b_hi[None]]
        if self.is_twostage:
            if self.is_proportional:
                f2 = jnp.broadcast_to(param_ls[0, 0], (n_delays,))
                R2 = jnp.broadcast_to(param_ls[1, 0], (n_delays,))
                G2 = param_ls[2, 0] * d
            else:
                f2, R2, G2 = param_ls[0], param_ls[1], param_ls[2]
            a2, b2 = self.compute_biquad_coeff(f2, R_shelf(R2), G2,
                                               "highshelf")
            rows_a.append(a2[None])
            rows_b.append(b2[None])
        a = jnp.concatenate(rows_a, axis=0)  # (rows, N, 3)
        b = jnp.concatenate(rows_b, axis=0)
        a = jnp.moveaxis(a, -1, 1)           # (rows, 3, N)
        b = jnp.moveaxis(b, -1, 1)
        env = (jnp.asarray(self.gamma, self.dtype)
               ** jnp.arange(3, dtype=self.dtype)).reshape(1, 3, 1)
        b3 = jnp.moveaxis(b * env, 1, 0)     # (3, rows, N)
        a3 = jnp.moveaxis(a * env, 1, 0)
        return b3, a3

    def get_poly_coeff(self, param):
        b3, a3 = self._envelope_coeffs(param)
        B = poly_response(b3, self.nfft)
        A = poly_response(a3, self.nfft)
        return _iir_guard_prods(
            *cascade_prods(b3, a3, self.nfft)), B, A

    def response(self, ext_param=None):
        return self.get_poly_coeff(self.map(self._raw(ext_param)))[0]

    def __call__(self, x, ext_param=None):
        self.check_input_shape(x)
        H = self.response(ext_param)
        return jnp.einsum("fn,bfn...->bfn...", H, x)

    def probe(self, z):
        """diag of the per-line PEQ response at arbitrary z (the reference
        probe protocol, dsp.py:343-352): product over sections of the
        envelope-scaled biquad transfer functions."""
        b3, a3 = self._envelope_coeffs(self.map(self.param))
        k = jnp.arange(3, dtype=self.dtype)
        zk = (jnp.asarray(z).astype(self.cdtype)
              ** (-k)).reshape(3, 1, 1)
        num = jnp.sum(b3.astype(self.cdtype) * zk, axis=0)  # (rows, N)
        den = jnp.sum(a3.astype(self.cdtype) * zk, axis=0)
        return jnp.diag(jnp.prod(num / den, axis=0))


class parallelFirstOrderShelving(dsp.parallelFilter):
    """First-order shelving attenuation from RT at DC and Nyquist
    (reference reverb.py:808-887)."""

    def __init__(self, nfft=2**11, fs=48000, rt_nyquist=0.2, delays=None,
                 alias_decay_db=0.0, requires_grad=False, dtype=jnp.float32,
                 key=None):
        assert delays is not None, "Delays must be provided"
        self.delays = tuple(int(d) for d in np.asarray(delays).reshape(-1))
        self.rt_nyquist = float(rt_nyquist)
        self.fs = fs
        super().__init__(size=(2,), nfft=nfft, map=_identity,
                         alias_decay_db=alias_decay_db,
                         requires_grad=requires_grad, dtype=dtype, key=key)

    def check_param_shape(self):
        assert len(self.size) == 1, (
            "Filter must be 1D, for 2D filters use Filter module."
        )

    def get_io(self):
        self.input_channels = len(self.delays)
        self.output_channels = len(self.delays)

    def map_param(self, param):
        """(rt_DC, omega_c) -> first-order (b, a) per delay line
        (reference reverb.py:865-880)."""
        d = jnp.asarray(self.delays, dtype=self.dtype)
        rt_DC = param[0]
        gain_DC = rt2slope(rt_DC, self.fs) * d
        gain_Nyq = rt2slope(jnp.asarray(self.rt_nyquist, self.dtype),
                            self.fs) * d
        omega_c = jnp.clip(param[1], 0.0, jnp.pi)
        t = jnp.tan(omega_c / 2)
        k = 10 ** (gain_DC / 20) / 10 ** (gain_Nyq / 20)
        sk = jnp.sqrt(k)
        a = jnp.stack([t / sk + 1, t / sk - 1])
        b = jnp.stack([t * sk + 1, t * sk - 1])
        return b * 10 ** (gain_Nyq / 20), a

    def _envelope_coeffs(self, param):
        """First-order (b, a) per delay line with the alias envelope folded
        in, each (2, N) — shared by the response and probing."""
        b, a = self.map_param(param)
        env = (jnp.asarray(self.gamma, self.dtype)
               ** jnp.arange(2, dtype=self.dtype)).reshape(2, 1)
        return b * env, a * env

    def get_poly_coeff(self, param):
        b2, a2 = self._envelope_coeffs(param)
        B = poly_response(b2, self.nfft)
        A = poly_response(a2, self.nfft)
        return B / A, B, A

    def response(self, ext_param=None):
        return self.get_poly_coeff(self.map(self._raw(ext_param)))[0]

    def probe(self, z):
        """diag of the per-line shelving response at arbitrary z.  The
        inherited parallelFilter probe treats the raw (rt_DC, omega_c)
        params as FIR taps — this one shares `_envelope_coeffs` with the
        response path."""
        b2, a2 = self._envelope_coeffs(self.map(self.param))
        zk = (jnp.asarray(z).astype(self.cdtype)
              ** (-jnp.arange(2, dtype=self.dtype))).reshape(2, 1)
        num = jnp.sum(b2.astype(self.cdtype) * zk, axis=0)  # (N,)
        den = jnp.sum(a2.astype(self.cdtype) * zk, axis=0)
        return jnp.diag(num / den)


# parallelFDNPEQ subclasses Filter (MIMO) but produces a DIAGONAL per-bin
# response (one filter per delay line) — register the diag operator kind.
from flamo_tpu.processor.dsp import _mr_diag as _reverb_mr_diag  # noqa: E402

parallelFDNPEQ.matrix_response = _reverb_mr_diag
