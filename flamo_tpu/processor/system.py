"""System composition (counterpart of reference flamo/processor/system.py).

``Series`` / ``Recursion`` / ``Parallel`` / ``Shell`` are immutable pytrees
whose children are modules; the whole tree jits into one XLA program.  All
shape/attribute validation happens eagerly at construction with the
reference's error messages (system.py:211-277, 441-515, 901-976) — a
deliberate UX property of the original that is preserved trace-free here.

The reference's mutating idioms become functional:
  * ``append/prepend/insert`` return a NEW Series,
  * ``Shell.get_time_response`` builds a temporary functional copy with
    swapped IO layers instead of mutating the model (system.py:1012-1079).
"""

from __future__ import annotations

import warnings
from collections import OrderedDict
from typing import Optional

import jax
import jax.numpy as jnp

from flamo_tpu.core import Module, complex_dtype_for
from flamo_tpu.ops import linop
from flamo_tpu.ops.solve import closed_loop_solve, gauss_solve
from flamo_tpu.processor.dsp import FFT, iFFT, Transform, _alias_envelope
from flamo_tpu.functional import signal_gallery


def _matrix_response_of(module, ext_param=None):
    """(kind, H) per-bin linear map of a module, or None if unknown."""
    fn = getattr(module, "matrix_response", None)
    if fn is None:
        return None
    try:
        return fn(ext_param) if ext_param is not None else fn()
    except NotImplementedError:
        return None


def _diag_flat_split(module, ext_param=None):
    """Factor a module's per-bin map as ``diag(d(f)) @ U`` (rows-scaled
    frequency-flat matrix).  Returns ``(d, U)`` with d (M, N) or (1, N)
    and U (N, N), or None when the structure does not factor that way.

    Recognized: a FLAT module directly (d = 1), and a Series of one FLAT
    stage followed by any number of DIAG stages — the reference FDN
    feedback topology ``Series(mixing_matrix, attenuation)``, whose map is
    ``diag(g(f)) @ U``.  (DIAG *before* the FLAT stage scales columns, a
    different form, and returns None.)  This is what lets the fused Pallas
    FDN kernel cover attenuated FDNs, not just the colorless one."""
    r = _matrix_response_of(module, ext_param)
    if r is not None and r[0] == linop.FLAT:
        return jnp.ones((1, r[1].shape[0]), r[1].dtype), r[1]
    if isinstance(module, Series):
        U = d = None
        for key, sub in zip(module.keys, module.modules):
            sext = (_ext_for(ext_param, key) if ext_param is not None
                    else None)
            rr = _matrix_response_of(sub, sext)
            if rr is None:
                return None
            kind, H = rr
            if kind == linop.FLAT:
                if U is not None or d is not None:
                    return None  # second flat / flat after diag
                U = H
            elif kind == linop.DIAG:
                if U is None:
                    return None  # diag before flat: columns-scaled form
                d = H if d is None else d * H
            else:
                return None
        if U is None:
            return None
        if d is None:
            d = jnp.ones((1, U.shape[0]), U.dtype)
        return d, U
    return None

_CHECK_ATTRS = ("nfft", "alias_decay_db", "dtype")


def _attr_of(module, attr):
    v = getattr(module, attr, None)
    return v


# ============================= SERIES ================================


class Series(Module):
    """Cascade container (reference system.py:11-329).

    Accepts modules, dicts/OrderedDicts (custom keys), and nested Series,
    which are recursively flattened with unique-key bookkeeping
    (reference ``__unpack_modules``, system.py:127-209)."""

    leaf_fields = ("modules",)

    def __init__(self, *args):
        items = _unpack_modules(args, [])
        self.keys = tuple(k for k, _ in items)
        self.modules = tuple(v for _, v in items)
        self.nfft = self.__check_attribute("nfft")
        self.alias_decay_db = self.__check_attribute("alias_decay_db")
        self.dtype = self.__check_attribute("dtype")
        self.input_channels, self.output_channels = self.__check_io()

    # -- container protocol ------------------------------------------------
    def __len__(self):
        return len(self.modules)

    def __iter__(self):
        return iter(self.modules)

    def __getitem__(self, idx):
        if isinstance(idx, str):
            return self.modules[self.keys.index(idx)]
        return self.modules[idx]

    def __getattr__(self, name):
        # named access to children: series.feedback_loop etc.
        keys = object.__getattribute__(self, "__dict__").get("keys", ())
        if name in keys:
            mods = object.__getattribute__(self, "__dict__")["modules"]
            return mods[keys.index(name)]
        raise AttributeError(
            f"{type(self).__name__} has no attribute {name!r}"
        )

    def named_modules(self):
        return list(zip(self.keys, self.modules))

    # -- functional structure edits ----------------------------------------
    def prepend(self, new_module) -> "Series":
        return self.insert(0, new_module)

    def append(self, new_module) -> "Series":
        return self.insert(len(self.modules), new_module)

    def insert(self, index: int, new_module) -> "Series":
        n = len(self.modules)
        if not (-n <= index <= n):
            raise IndexError("Index out of range.")
        if index < 0:
            index += n
        unpacked = _unpack_modules((new_module,), list(self.keys))
        items = list(zip(self.keys, self.modules))
        for off, kv in enumerate(unpacked):
            items.insert(index + off, kv)
        return Series(OrderedDict(items))

    # -- validation ----------------------------------------------------------
    def __check_attribute(self, attr):
        value = None
        for module in self.modules:
            v = _attr_of(module, attr)
            if v is not None:
                value = v
                break
        if value is None:
            warnings.warn(f"Attribute {attr} not found in any of the modules.")
        else:
            for i, module in enumerate(self.modules):
                v = _attr_of(module, attr)
                if v is not None and v != value:
                    raise ValueError(
                        f"All modules must have the same {attr} value. Module "
                        f"{type(module).__name__} at index {i} is incoherent "
                        f"with the part of the Series preceding it."
                    )
        return value

    def __check_io(self):
        input_channels = None
        prev_out = None
        first = None
        for i, module in enumerate(self.modules):
            if getattr(module, "input_channels", None) is not None:
                input_channels = module.input_channels
                first = i
                break
        if first is not None:
            prev_name = type(self.modules[first]).__name__
            prev_pos = first
            prev_out = self.modules[first].output_channels
            for j, module in enumerate(self.modules):
                if j <= first:
                    continue
                if getattr(module, "input_channels", None) is not None:
                    assert module.input_channels == prev_out, (
                        f"Module {prev_name} at index {prev_pos} has "
                        f"{prev_out} output channels, but module "
                        f"{type(module).__name__} at index {j} has "
                        f"{module.input_channels} input_channels."
                    )
                    prev_name = type(module).__name__
                    prev_pos = j
                    prev_out = getattr(module, "output_channels", None)
        return input_channels, prev_out

    # -- forward / probe -----------------------------------------------------
    def __call__(self, x, ext_param: Optional[dict] = None):
        if ext_param is not None:
            for key, module in zip(self.keys, self.modules):
                sub = _ext_for(ext_param, key)
                x = module(x, sub) if sub is not None else module(x)
        else:
            for module in self.modules:
                x = module(x)
        return x

    def matrix_response(self, ext_param=None):
        """Composed per-bin linear map of the cascade (cheapest kind)."""
        out = None
        for key, module in zip(self.keys, self.modules):
            sub = _ext_for(ext_param, key) if ext_param is not None else None
            r = _matrix_response_of(module, sub)
            if r is None:
                return None
            out = r if out is None else linop.compose(r[0], r[1],
                                                      out[0], out[1])
        return out

    def probe(self, z):
        """H(z) = H_n @ ... @ H_1 (reference system.py:303-319)."""
        H = None
        for module in self.modules:
            Hi = module.probe(z)
            if Hi is None:
                continue
            H = Hi if H is None else Hi @ H
        return H

    def probe_w(self, w):
        H = None
        for module in self.modules:
            Hi = module.probe_w(w)
            if Hi is None:
                continue
            H = Hi if H is None else Hi @ H
        return H


def _ext_for(ext_param: dict, key: str):
    """Pick the ext_param entry for a child: exact key or 'key.sub' prefix."""
    if ext_param is None or not isinstance(ext_param, dict):
        return None
    if key in ext_param:
        return ext_param[key]
    sub = {k[len(key) + 1:]: v for k, v in ext_param.items()
           if k.startswith(key + ".")}
    return sub or None


def _branch_ext(ext_param, prefix: str):
    """Per-branch ext payload for Recursion/Parallel: the branch's own raw
    params ('feedback': value) or a nested sub-dict
    ('feedforward.attenuation': value -> {'attenuation': value})."""
    if ext_param is None or not isinstance(ext_param, dict):
        return None
    if prefix in ext_param:
        return ext_param[prefix]
    sub = {k[len(prefix) + 1:]: v for k, v in ext_param.items()
           if k.startswith(prefix + ".")}
    return sub or None


def _unpack_modules(modules, current_keys: list):
    """Flatten nested Series/dicts into a list of (key, module) pairs with the
    reference's key rules (system.py:127-209)."""
    out = []  # list of (key, module)

    def used_keys():
        return current_keys + [k for k, _ in out]

    for module in modules:
        if isinstance(module, Series):
            out.extend(_unpack_modules(
                (OrderedDict(module.named_modules()),), used_keys()))
        elif isinstance(module, (OrderedDict, dict)):
            for k, v in module.items():
                if isinstance(v, Series):
                    out.extend(_unpack_modules(
                        (OrderedDict(v.named_modules()),), used_keys()))
                elif isinstance(v, (OrderedDict, dict)):
                    out.extend(_unpack_modules((v,), used_keys()))
                else:
                    try:
                        int(k)
                        new_key = str(len(used_keys()))
                        if k != new_key:
                            warnings.warn(
                                f"Key {k} is an integer, it will be "
                                f"overwritten."
                            )
                        out.append((new_key, v))
                    except ValueError:
                        if k in used_keys():
                            raise ValueError(
                                f"Key {k} is already present in the Series."
                            )
                        out.append((k, v))
        elif isinstance(module, Module):
            out.append((str(len(used_keys())), module))
        elif isinstance(module, (list, tuple)):
            out.extend(_unpack_modules(tuple(module), used_keys()))
        else:
            raise ValueError(
                "Modules must be Module, Series, or OrderedDict."
            )
    return out


# ============================= RECURSION ================================


class Recursion(Module):
    """Closed loop: Y = (I - F B)^{-1} F X per frequency bin
    (reference system.py:335-565).

    The per-bin batched solve is the framework's hottest op; it dispatches
    to :func:`flamo_tpu.ops.solve.closed_loop_solve` (unrolled Gaussian
    elimination vectorized over the M~48001 bin axis)."""

    leaf_fields = ("feedforward", "feedback")

    def __init__(self, fF, fB, solve_method: str = "ge"):
        if isinstance(fF, (OrderedDict, dict, list, tuple)):
            fF = Series(fF)
            warnings.warn(
                "Feedforward path has been converted to a Series class "
                "instance."
            )
        if isinstance(fB, (OrderedDict, dict, list, tuple)):
            fB = Series(fB)
            warnings.warn(
                "Feedback path has been converted to a Series class instance."
            )
        self.feedforward = fF
        self.feedback = fB
        self.solve_method = solve_method
        self.nfft = self.__check_attribute("nfft")
        self.alias_decay_db = self.__check_attribute("alias_decay_db")
        self.dtype = self.__check_attribute("dtype")
        self.input_channels, self.output_channels = self.__check_io()

    def __check_attribute(self, attr):
        ff = _attr_of(self.feedforward, attr)
        fb = _attr_of(self.feedback, attr)
        if ff is None:
            warnings.warn(
                f"The feedforward pass does not possess the attribute {attr}."
            )
        if fb is None:
            warnings.warn(
                f"The feedback pass does not possess the attribute {attr}."
            )
        if ff is not None and fb is not None:
            assert ff == fb, (
                f"The feedforward pass has {attr} = {ff} and feedback pass "
                f"has {attr} = {fb}. They must have the same value."
            )
        return ff if ff is not None else fb

    def __check_io(self):
        ff_in = getattr(self.feedforward, "input_channels", None)
        ff_out = getattr(self.feedforward, "output_channels", None)
        fb_in = getattr(self.feedback, "input_channels", None)
        fb_out = getattr(self.feedback, "output_channels", None)
        if ff_in is None:
            raise ValueError(
                "The feedforward pass does not possess the attribute "
                "input_channels."
            )
        if ff_out is None:
            raise ValueError(
                "The feedforward pass does not possess the attribute "
                "output_channels."
            )
        if fb_in is None:
            raise ValueError(
                "The feedback pass does not possess the attribute "
                "input_channels."
            )
        if fb_out is None:
            raise ValueError(
                "The feedback pass does not possess the attribute "
                "output_channels."
            )
        assert ff_out == fb_in, (
            f"Feedforward pass has {ff_out} output channels, but feedback "
            f"pass has {fb_in} input channels. They must be the same."
        )
        assert fb_out == ff_in, (
            f"Feedforward pass {ff_in} input channels, but the feedback pass "
            f"has {fb_out} output channels. They must be the same."
        )
        return ff_in, ff_out

    def __call__(self, x, ext_param: Optional[dict] = None):
        ext_ff = _branch_ext(ext_param, "feedforward")
        ext_fb = _branch_ext(ext_param, "feedback")

        B = (self.feedforward(x, ext_ff) if ext_ff is not None
             else self.feedforward(x))

        N = self.output_channels
        M = self.nfft // 2 + 1
        cdtype = B.dtype if jnp.issubdtype(B.dtype, jnp.complexfloating) \
            else complex_dtype_for(B.dtype)

        # Per-bin loop matrix F(z) B(z) via the linear-operator protocol —
        # avoids feeding an (M, N, N) identity through the module graph
        # (same math as the reference's system.py:417-425, far fewer ops).
        rF = _matrix_response_of(self.feedforward, ext_ff)
        rB = _matrix_response_of(self.feedback, ext_fb)
        split = (_diag_flat_split(self.feedback, ext_fb)
                 if self.solve_method == "pallas" else None)
        if (self.solve_method == "pallas" and rF is not None
                and rF[0] == linop.DIAG and split is not None
                and B.ndim == 3):
            # FDN structure (diag feedforward x [diag-scaled] flat
            # feedback): the fused Pallas kernel assembles I - diag(D) U
            # in vector registers — the (M, N, N) loop matrix never
            # touches HBM.  Any per-bin diagonal stages after the mixing
            # matrix (delay-scaled attenuation etc.) fold into D:
            # I - diag(D_F) diag(g) U = I - diag(D_F * g) U.  The FLAT
            # factor comes from Gain-family modules with real parameters,
            # so jnp.real is faithful (and keeps the cotangent flowing).
            from flamo_tpu.ops.pallas_solve import pallas_fdn_solve

            dB, U = split
            D = jnp.broadcast_to(
                rF[1].astype(cdtype) * dB.astype(cdtype), (M, N))
            U = jnp.real(U)
            batch = B.shape[0]
            Df = jnp.broadcast_to(D[None], (batch, M, N)).reshape(-1, N)
            y = pallas_fdn_solve(Df, U, B.reshape(-1, N))
            return y.reshape(B.shape)
        if rF is not None and rB is not None:
            kL, L = linop.compose(rF[0], rF[1], rB[0], rB[1])
            A = (jnp.eye(N, dtype=cdtype)
                 - linop.materialize(kL, L.astype(cdtype), M, N, N))
            A = jnp.broadcast_to(A[None], (x.shape[0], M, N, N))
        else:
            # fallback: identity feed (supports custom user modules)
            eye = jnp.eye(N, dtype=cdtype)
            I = jnp.broadcast_to(eye, (x.shape[0], M, N, N))
            HH = self.feedback(I, ext_fb) if ext_fb is not None \
                else self.feedback(I)
            A = I - (self.feedforward(HH, ext_ff) if ext_ff is not None
                     else self.feedforward(HH))
        return closed_loop_solve(A, B, method=self.solve_method)

    def matrix_response(self, ext_param=None):
        """Closed-loop per-bin map (I - F B)^{-1} F as a dense operator."""
        ext_ff = _branch_ext(ext_param, "feedforward")
        ext_fb = _branch_ext(ext_param, "feedback")
        rF = _matrix_response_of(self.feedforward, ext_ff)
        rB = _matrix_response_of(self.feedback, ext_fb)
        if rF is None or rB is None:
            return None
        N_out, N_in = self.output_channels, self.input_channels
        M = self.nfft // 2 + 1
        Fm = linop.materialize(rF[0], rF[1], M, N_out, N_in)
        cdtype = Fm.dtype
        kL, L = linop.compose(rF[0], rF[1], rB[0], rB[1])
        A = (jnp.eye(N_out, dtype=cdtype)
             - linop.materialize(kL, L.astype(cdtype), M, N_out, N_out))
        # The fused pallas kernel is vector-rhs-only so it cannot serve
        # here; map it to the PIVOTED solve ('ge') rather than its
        # no-pivot XLA twin ('ge_cached') — matrix_response is not a hot
        # path and, unlike bench's ge_nopivot users, this call has no
        # finite-loss gate to catch a pivotless breakdown on loops
        # without the stable-FDN diag structure.
        method = ("ge" if self.solve_method == "pallas"
                  else self.solve_method)
        return linop.FULL, closed_loop_solve(A, Fm, method=method)

    def probe(self, z):
        """H(z) = solve(I - F B, F) (reference system.py:517-534)."""
        F = self.feedforward.probe(z)
        Bz = self.feedback.probe(z)
        N = F.shape[-1]
        I = jnp.eye(N, dtype=F.dtype)
        return jnp.linalg.solve(I - F @ Bz, F)

    def probe_recursion(self, z, include_shell_io: bool = False, **kwargs):
        """Characteristic matrix P(z) = I - F B (reference system.py:536-552)."""
        F = self.feedforward.probe(z)
        Bz = self.feedback.probe(z)
        N = F.shape[0]
        return jnp.eye(N, dtype=F.dtype) - F @ Bz

    def probe_recursion_w(self, w):
        F = self.feedforward.probe_w(w)
        Bz = self.feedback.probe_w(w)
        N = F.shape[0]
        return jnp.eye(N, dtype=F.dtype) - F @ Bz

    def probe_w(self, w):
        F = self.feedforward.probe_w(w)
        Bz = self.feedback.probe_w(w)
        N = F.shape[-1]
        I = jnp.eye(N, dtype=F.dtype)
        return jnp.linalg.solve(I - F @ Bz, F)


# ============================= PARALLEL ================================


class Parallel(Module):
    """Two branches over the same input, summed or channel-concatenated
    (reference system.py:570-772)."""

    leaf_fields = ("branchA", "branchB")

    def __init__(self, brA, brB, sum_output: bool = True):
        if isinstance(brA, (OrderedDict, dict, list, tuple)):
            brA = Series(brA)
            warnings.warn("Branch A has been converted to a Series class instance.")
        if isinstance(brB, (OrderedDict, dict, list, tuple)):
            brB = Series(brB)
            warnings.warn("Branch B has been converted to a Series class instance.")
        self.branchA = brA
        self.branchB = brB
        self.sum_output = bool(sum_output)
        self.nfft = self.__check_attribute("nfft")
        self.alias_decay_db = self.__check_attribute("alias_decay_db")
        self.dtype = self.__check_attribute("dtype")
        self.input_channels, self.output_channels = self.__check_io()

    def __check_attribute(self, attr):
        a = _attr_of(self.branchA, attr)
        b = _attr_of(self.branchB, attr)
        if a is None:
            warnings.warn(
                f"The feedforward pass does not possess the attribute {attr}."
            )
        if b is None:
            warnings.warn(
                f"The feedback pass does not possess the attribute {attr}."
            )
        if a is not None and b is not None:
            assert a == b, (
                f"Branch A has {attr} = {a} and branch B has {attr} = {b}. "
                f"They must have the same value."
            )
        return a if a is not None else b

    def __check_io(self):
        a_in = getattr(self.branchA, "input_channels", None)
        a_out = getattr(self.branchA, "output_channels", None)
        b_in = getattr(self.branchB, "input_channels", None)
        b_out = getattr(self.branchB, "output_channels", None)
        if a_in is None:
            raise ValueError(
                "Branch A does not possess the attribute input_channels."
            )
        if a_out is None:
            raise ValueError(
                "Branch A does not possess the attribute output_channels."
            )
        if b_in is None:
            raise ValueError(
                "Branch B does not possess the attribute input_channels."
            )
        if b_out is None:
            raise ValueError(
                "Branch B does not possess the attribute output_channels."
            )
        assert a_in == b_in, (
            f"Branch A has {a_in} input channels, but branch B has {b_in} "
            f"input channels. They must be the same."
        )
        if self.sum_output:
            assert a_out == b_out, (
                f"Branch A has {a_out} output channels, but branch B has "
                f"{b_out} output channels. They must be the same if their "
                f"output is being summed."
            )
            return a_in, a_out
        return a_in, a_out + b_out

    def __call__(self, x, ext_param: Optional[dict] = None):
        ext_a = _branch_ext(ext_param, "branchA")
        ext_b = _branch_ext(ext_param, "branchB")
        YA = self.branchA(x, ext_a) if ext_a is not None else self.branchA(x)
        YB = self.branchB(x, ext_b) if ext_b is not None else self.branchB(x)
        if self.sum_output:
            return YA + YB
        return jnp.concatenate((YA, YB), axis=2)

    def matrix_response(self, ext_param=None):
        ext_a = _branch_ext(ext_param, "branchA")
        ext_b = _branch_ext(ext_param, "branchB")
        rA = _matrix_response_of(self.branchA, ext_a)
        rB = _matrix_response_of(self.branchB, ext_b)
        if rA is None or rB is None:
            return None
        M = self.nfft // 2 + 1
        if self.sum_output:
            return linop.add(rA[0], rA[1], rB[0], rB[1], M,
                             self.output_channels, self.input_channels)
        a_out = self.branchA.output_channels
        b_out = self.branchB.output_channels
        Ha = linop.materialize(rA[0], rA[1], M, a_out, self.input_channels)
        Hb = linop.materialize(rB[0], rB[1], M, b_out, self.input_channels)
        return linop.FULL, jnp.concatenate([Ha, Hb], axis=1)

    def probe(self, z):
        HA = self.branchA.probe(z)
        HB = self.branchB.probe(z)
        if self.sum_output:
            return HA + HB
        return jnp.concatenate([HA, HB], axis=0)

    def probe_w(self, w):
        HA = self.branchA.probe_w(w)
        HB = self.branchB.probe_w(w)
        if self.sum_output:
            return HA + HB
        return jnp.concatenate([HA, HB], axis=0)


# ============================= SHELL ================================


class _Identity(Module):
    leaf_fields = ("param",)

    def __init__(self):
        self.param = None

    def __call__(self, x, ext_param=None):
        return x

    def probe(self, z):
        return None

    def probe_w(self, w):
        return None


class Shell(Module):
    """Model container: input layer -> core -> output layer
    (reference system.py:776-1154)."""

    leaf_fields = ("core", "input_layer", "output_layer")

    def __init__(self, core, input_layer=None, output_layer=None):
        if isinstance(core, (OrderedDict, dict, list, tuple)):
            core = Series(core)
            warnings.warn("Core has been converted to a Series class instance.")
        if input_layer is None:
            input_layer = _Identity()
        elif isinstance(input_layer, (OrderedDict, dict, list, tuple)):
            input_layer = Series(input_layer)
            warnings.warn(
                "Input layer has been converted to a Series class instance."
            )
        if output_layer is None:
            output_layer = _Identity()
        elif isinstance(output_layer, (OrderedDict, dict, list, tuple)):
            output_layer = Series(output_layer)
            warnings.warn(
                "Output layer has been converted to a Series class instance."
            )
        self.core = core
        self.input_layer = input_layer
        self.output_layer = output_layer
        self.nfft = self.__check_attribute("nfft")
        self.alias_decay_db = self.__check_attribute("alias_decay_db")
        self.dtype = self.__check_attribute("dtype")
        self.input_channels, self.output_channels = self.__check_io()

    def __check_attribute(self, attr):
        core_v = _attr_of(self.core, attr)
        if core_v is None:
            raise ValueError(f"The core does not possess the attribute {attr}.")
        in_v = _attr_of(self.input_layer, attr)
        if in_v is not None:
            assert core_v == in_v, (
                f"The input layer has {attr} = {in_v} and the core has "
                f"{attr} = {core_v}. They must have the same value."
            )
        out_v = _attr_of(self.output_layer, attr)
        if out_v is not None:
            assert core_v == out_v, (
                f"The core has {attr} = {core_v} and the output layer has "
                f"{attr} = {out_v}. They must have the same value."
            )
        return core_v

    def __check_io(self):
        if getattr(self.core, "input_channels", None) is None:
            raise ValueError(
                "The core does not possess the attribute input_channels."
            )
        in_out = getattr(self.input_layer, "output_channels", None)
        if in_out is not None:
            assert self.core.input_channels == in_out, (
                f"The core should receive {self.core.input_channels} input "
                f"channels, but {in_out} channels arrive from the input layer."
            )
        if getattr(self.core, "output_channels", None) is None:
            raise ValueError(
                "The core does not possess the attribute output_channels."
            )
        out_in = getattr(self.output_layer, "input_channels", None)
        if out_in is not None:
            assert self.core.output_channels == out_in, (
                f"The core sends {self.core.output_channels} output channels, "
                f"but the output layer can only receive {out_in} channels."
            )
        in_ch = getattr(self.input_layer, "input_channels", None)
        out_ch = getattr(self.output_layer, "output_channels", None)
        if in_ch is None:
            in_ch = self.core.input_channels
        if out_ch is None:
            out_ch = self.core.output_channels
        return in_ch, out_ch

    def __call__(self, x, ext_param: Optional[dict] = None):
        x = self.input_layer(x)
        x = self.core(x, ext_param) if ext_param is not None else self.core(x)
        return self.output_layer(x)

    # -- get/set (functional setters return new Shells) ----------------------
    def get_inputLayer(self):
        return self.input_layer

    def set_inputLayer(self, input_layer) -> "Shell":
        return self.replace(input_layer=input_layer)

    def get_outputLayer(self):
        return self.output_layer

    def set_outputLayer(self, output_layer) -> "Shell":
        return self.replace(output_layer=output_layer)

    def get_core(self):
        return self.core

    def set_core(self, core) -> "Shell":
        return self.replace(core=core)

    # -- probing ---------------------------------------------------------------
    def probe(self, z, include_shell_io: bool = False):
        H = self.core.probe(z)
        if include_shell_io:
            in_H = self.input_layer.probe(z) if hasattr(
                self.input_layer, "probe") else None
            out_H = self.output_layer.probe(z) if hasattr(
                self.output_layer, "probe") else None
            if in_H is not None and H is not None:
                H = H @ in_H
            elif in_H is not None:
                H = in_H
            if out_H is not None and H is not None:
                H = out_H @ H
            elif out_H is not None:
                H = out_H
        return H

    # -- responses ---------------------------------------------------------------
    def _alias_undo_envelope(self):
        env = _alias_envelope(self.nfft, float(self.alias_decay_db),
                              self.dtype)
        return env.reshape(1, -1, 1)

    def get_time_response(self, fs: int = 48000, identity: bool = False,
                          interpret: bool = False):
        """Impulse response of the DSP (reference system.py:1012-1079).

        identity=True diag-embeds the input for input-free IRs."""
        env = self._alias_undo_envelope()
        with warnings.catch_warnings():
            # the temporary iFFT+envelope Series has no alias_decay_db
            # attribute to check — suppress the spurious coherence warning
            warnings.simplefilter("ignore")
            tmp = self.replace(
                input_layer=FFT(self.nfft, dtype=self.dtype),
                output_layer=Series(
                    iFFT(self.nfft, dtype=self.dtype),
                    Transform(lambda x: x * (env if x.ndim == 3
                                             else env[..., None]),
                              dtype=self.dtype),
                ),
            )
        x = signal_gallery(batch_size=1, n_samples=self.nfft,
                           n=self.input_channels, signal_type="impulse",
                           fs=fs, dtype=self.dtype)
        if identity and self.input_channels > 1:
            x = jax.vmap(jax.vmap(jnp.diag))(x)  # (1, T, N) -> (1, T, N, N)
        return jax.lax.stop_gradient(tmp(x))

    def get_freq_response(self, fs: int = 48000, identity: bool = False):
        """Frequency response with the alias envelope undone
        (reference system.py:1081-1153).

        TPU design: instead of the reference's irfft -> envelope -> rfft
        round-trip (flagged '# TODO suboptimal' at system.py:1130), the
        time-domain envelope multiplication is applied as a frequency-domain
        circular convolution-free equivalent: we simply reuse
        get_time_response and rfft once."""
        y = self.get_time_response(fs=fs, identity=identity)
        return jnp.fft.rfft(y, n=self.nfft, axis=1)
