"""Active Acoustics model family (reference examples/e8_active_acoustics.py,
Dal Santo et al. DAFx-24): a MIMO electroacoustic feedback loop — physical
room responses around a trainable mixing-filter matrix — optimized for a
flat loop response, with gain-before-instability (GBI) analysis.

The reference binds this workload to measured RIR matrices; here the room
is pluggable: measured IRs, or synthetic WGN-reverb rooms for
reproducibility.
"""

from __future__ import annotations

from collections import OrderedDict

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
                           cache_room: bool = True,
                           solve_method: str = "ge", key=None):
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

    loop = system.Recursion(fF=room, fB=mixer, solve_method=solve_method)
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


class ActiveAcoustics:
    """Full DAFx-24 Active Acoustics system (reference
    examples/e8_active_acoustics.py:26-332, class ``AA``).

    Physical room (H_SM, H_SA, H_LM, H_LA filter matrices — measured or
    synthetic WGN reverb), virtual room (trainable FIR matrix ``U``, fixed
    WGN-reverb tail ``R``, general gain ``G``), and the feedback-loop shell
    ``F_MM`` whose forward on diag-embedded unit impulses yields the loop
    matrix per bin.  Eigenvalue workflow: :meth:`get_F_MM_eigenvalues`,
    :meth:`get_current_GBI` (gain before instability, computed at G=1),
    :meth:`set_G_to_GBI`, :meth:`normalize_U`, and
    :meth:`system_simulation` (natural + electroacoustic path IR).

    Modules are immutable pytrees, so this is a mutable orchestration
    wrapper: setters replace the stored module and rebuild ``F_MM``.
    Train ``aa.F_MM`` with the Trainer + :class:`flamo_tpu.optimize.mse_evs`
    (the differentiable eigenvalue objective), then :meth:`adopt` the
    trained shell.
    """

    def __init__(self, n_S: int, n_M: int, n_L: int, n_A: int,
                 fs: int = 48000, nfft: int = 2 ** 11, FIR_order: int = 100,
                 wgn_RT: float = 1.0, alias_decay_db: float = 0.0,
                 room_irs: dict | None = None, rir_length: int | None = None,
                 room_t60: float = 0.5, cache_room: bool = True,
                 solve_method: str = "ge", dtype=jnp.float32, key=None):
        self.fs, self.nfft = fs, nfft
        self.n_S, self.n_M, self.n_L, self.n_A = n_S, n_M, n_L, n_A
        self.alias_decay_db = alias_decay_db
        self.cache_room = cache_room
        # 'ge_cached' measured 2.6x faster on TPU (the pivot search is six
        # iota+reduce kernels costing 60% of the step); kept off the
        # default for the general AA loop, which has no diagonal-dominance
        # guarantee — opt in per workload.
        self.solve_method = solve_method
        self.dtype = dtype
        key = next_key(key)
        ks = jax.random.split(key, 6)

        # physical room: measured IRs by name, else synthetic WGN reverb
        # (the reference binds to rirs/Otala-2024.05.10 WAVs, not shipped)
        if room_irs is None:
            room_irs = {}
            for name, shape, k in (("H_SM", (n_M, n_S), ks[0]),
                                   ("H_SA", (n_A, n_S), ks[1]),
                                   ("H_LM", (n_M, n_L), ks[2]),
                                   ("H_LA", (n_A, n_L), ks[3])):
                ir = WGN_reverb(shape, t60=room_t60, samplerate=fs, key=k,
                                dtype=dtype)
                room_irs[name] = ir[:rir_length] if rir_length else ir

        def frozen_filter(arr):
            arr = jnp.asarray(arr, dtype=dtype)
            f = dsp.Filter(size=arr.shape, nfft=nfft, requires_grad=False,
                           alias_decay_db=alias_decay_db, dtype=dtype)
            return f.assign_value(arr)

        self.H_SM = frozen_filter(room_irs["H_SM"])
        self.H_SA = frozen_filter(room_irs["H_SA"])
        self.H_LM = frozen_filter(room_irs["H_LM"])
        self.H_LA = frozen_filter(room_irs["H_LA"])

        # virtual room: trainable FIR matrix U, WGN reverb tail R, gain G
        self.G = dsp.parallelGain(
            size=(n_L,), nfft=nfft, alias_decay_db=alias_decay_db,
            dtype=dtype).assign_value(jnp.ones(n_L, dtype=dtype))
        self.U = dsp.Filter(size=(FIR_order, n_L, n_M), nfft=nfft,
                            requires_grad=True,
                            alias_decay_db=alias_decay_db, dtype=dtype,
                            key=ks[4])
        wgn = WGN_reverb((n_L,), t60=wgn_RT, samplerate=fs, key=ks[5],
                         dtype=dtype)
        self.R = dsp.parallelFilter(
            size=wgn.shape, nfft=nfft, alias_decay_db=alias_decay_db,
            dtype=dtype).assign_value(wgn)

        self._rebuild_F_MM()
        self.set_G_to_GBI()

    # ------------------------------------------------------------------
    def _room(self, module):
        return dsp.CachedResponse(module) if self.cache_room else module

    def _rebuild_F_MM(self):
        import warnings

        core = system.Series(OrderedDict(
            [("U", self.U), ("R", self.R), ("G", self.G),
             ("H_LM", self._room(self.H_LM))]))
        eye = jnp.eye(self.n_M, dtype=self.dtype)
        diag_embed = dsp.Transform(lambda x: x[..., None] * eye,
                                   dtype=self.dtype)
        with warnings.catch_warnings():
            # the Transform+FFT input Series carries no alias_decay_db —
            # suppress the spurious attribute-coherence warning
            warnings.simplefilter("ignore")
            self.F_MM = system.Shell(
                core=core,
                input_layer=system.Series(
                    diag_embed, dsp.FFT(self.nfft, dtype=self.dtype)))

    def __call__(self, x):
        """One feedback-loop iteration: unit impulses (B, T, n_M) give the
        microphone signals; diag-embedded impulses give the loop matrix
        (reference e8_active_acoustics.py:143-159)."""
        return self.F_MM(x)

    forward = __call__

    # -- general gain ---------------------------------------------------
    def get_G(self):
        return self.G

    def set_G(self, g) -> None:
        """Set the general gain (linear scale)."""
        g = jnp.asarray(g, dtype=self.dtype)
        self.G = self.G.assign_value(g * jnp.ones(self.n_L,
                                                  dtype=self.dtype))
        self._rebuild_F_MM()

    def get_current_GBI(self):
        """Gain Before Instability (linear scale), always with respect to
        G=1 (reference e8_active_acoustics.py:183-215)."""
        g_current = self.G.param[0]
        self.set_G(1.0)
        max_ev = jnp.max(jnp.abs(self.get_F_MM_eigenvalues()))
        self.set_G(g_current)
        return 1.0 / max_ev

    def set_G_to_GBI(self) -> None:
        self.set_G(self.get_current_GBI())

    # -- virtual room ----------------------------------------------------
    def normalize_U(self, value: float = 1.0) -> None:
        """Normalize U's IRs to Frobenius norm ``value``
        (reference e8_active_acoustics.py:240-252)."""
        p = self.U.param
        self.U = self.U.assign_value(
            p / jnp.sqrt(jnp.sum(p ** 2)) * value)
        self._rebuild_F_MM()

    # -- feedback-loop matrix -------------------------------------------
    def get_F_MM_eigenvalues(self):
        """Eigenvalues of the loop matrix at every bin, (1, M, n_M)
        (reference e8_active_acoustics.py:258-271).  No-grad analysis via
        the host-callback eig; training uses
        :class:`flamo_tpu.optimize.mse_evs` instead."""
        H = self.F_MM.get_freq_response(fs=self.fs, identity=True)
        return get_eigenvalues(H)

    # -- full system -----------------------------------------------------
    def _create_system(self):
        processor = system.Series(OrderedDict(
            [("U", self.U), ("R", self.R), ("G", self.G)]))
        feedback_loop = system.Recursion(fF=processor,
                                         fB=self._room(self.H_LM),
                                         solve_method=self.solve_method)
        ea_path = system.Shell(
            core=system.Series(OrderedDict(
                [("H_SM", self._room(self.H_SM)),
                 ("FeedbackLoop", feedback_loop),
                 ("H_LA", self._room(self.H_LA))])),
            input_layer=dsp.FFT(self.nfft, dtype=self.dtype),
            output_layer=dsp.iFFT(self.nfft, dtype=self.dtype))
        nat_path = system.Shell(
            core=self._room(self.H_SA),
            input_layer=dsp.FFT(self.nfft, dtype=self.dtype),
            output_layer=dsp.iFFT(self.nfft, dtype=self.dtype))
        return nat_path, ea_path

    def system_simulation(self):
        """Full-system impulse response: natural + electroacoustic paths,
        (1, nfft, n_A) (reference e8_active_acoustics.py:316-332)."""
        nat_path, ea_path = self._create_system()
        return (nat_path.get_time_response(fs=self.fs)
                + ea_path.get_time_response(fs=self.fs))

    # -- training interop -------------------------------------------------
    def adopt(self, trained_shell: system.Shell) -> None:
        """Pull trained modules back from a Trainer-owned ``F_MM`` shell
        (modules are immutable pytrees, so training produces a new one)."""
        core = trained_shell.get_core()
        self.U = core["U"]
        self.R = core["R"]
        self.G = core["G"]
        hlm = core["H_LM"]
        if isinstance(hlm, dsp.Filter):
            self.H_LM = hlm
        self._rebuild_F_MM()


def aa_hoisted_room_step(model: system.Shell, inputs, targets,
                         lr: float = 1e-3):
    """Build (jittable_multi, opt_state) for the AA magnitude-MSE
    workload with the frozen room response HOISTED out of the scanned
    steps.

    The room is a frozen 15000-tap (mics, lds) FIR whose
    pad->rfft->response chain re-ran inside EVERY training step on the
    module-graph path (profiled 2026-08-17: the step is ~30 fusions/
    pads/copies at 260-570 us each over (M, 4, 13) 20 MB-class arrays,
    10.8 ms/step total).  Here ``multi(m, o, x, t)`` computes the room
    response and the input spectrum ONCE per call — in-trace, so
    nothing is transferred or cached across calls (the 20 MB cached
    leaf trips the tunnel's transfer bug, CLAUDE.md) — and the
    ``lax.scan`` body solves the loop with a
    :class:`dsp.CachedResponse`-wrapped room.

    Loss semantics are identical to the graph path:
    ``mean((|Shell(FFT -> Recursion(room, mixer))(x)| - t)^2)`` —
    bench gates the two paths against each other."""
    import optax

    from flamo_tpu.core import masked_optimizer

    tx = masked_optimizer(optax.adam(lr), model)
    opt_state = tx.init(model)
    nfft = model.nfft
    solve_method = model.get_core().solve_method

    def multi(m, o, x, t, k):
        loop = m.get_core()
        room_cached = dsp.CachedResponse(loop.feedforward)  # hoisted
        X = jnp.fft.rfft(x, n=nfft, axis=1)  # hoisted

        def loss_fn(mm):
            loop2 = system.Recursion(fF=room_cached,
                                     fB=mm.get_core().feedback,
                                     solve_method=solve_method)
            est = jnp.abs(loop2(X))
            return jnp.mean((est - t) ** 2)

        def body(carry, _):
            mm, oo = carry
            loss, g = jax.value_and_grad(loss_fn)(mm)
            up, oo = tx.update(g, oo, mm)
            return (optax.apply_updates(mm, up), oo), loss

        (m, o), losses = jax.lax.scan(body, (m, o), None, length=k)
        return m, o, losses[-1]

    return multi, opt_state


def gain_before_instability_diff(model: system.Shell, subsample: int = 32,
                                 iters: int = 64):
    """Differentiable, fully on-device GBI via power-iteration spectral
    radius (no host eig callback) — usable inside jit/grad, e.g. as a
    stability regularizer during training.  The reference's GBI
    (e8_active_acoustics.py:183-215) is eager analysis only."""
    rho = spectral_radius(open_loop_matrix(model, subsample), iters=iters)
    return -20 * jnp.log10(jnp.max(rho))


def aa_dft_basis(order: int, nfft: int):
    """Host-side (order, M) rfft-grid DFT basis E[t, m] = e^{-j 2 pi t m
    / nfft} as a real (er, ei) numpy pair — the tap->response map
    ``G[c, m] = sum_t taps[t, c] E[t, m]`` is then one MXU matmul
    (exactly ``rfft(pad(taps))`` restricted to ``order`` nonzero taps).
    Built as numpy so jit tracing never needs a device->host transfer
    (the axon tunnel's transfer path flakes on big closure constants)."""
    M = nfft // 2 + 1
    t = np.arange(order, dtype=np.float64)[:, None]
    m = np.arange(M, dtype=np.float64)[None, :]
    ph = -2.0 * np.pi * t * m / nfft
    return (np.cos(ph).astype(np.float32), np.sin(ph).astype(np.float32))


def aa_fused_step(model: system.Shell, inputs, targets, lr: float = 1e-3,
                  pivot: bool = False):
    """Build (jittable_multi, opt_state, er, ei) for the AA
    magnitude-MSE workload on the fused Pallas step kernel
    (:func:`flamo_tpu.ops.pallas_aa_tf_mse`).

    Per scanned step, everything per-bin — assembling I - H G, the
    N x N solve, the loss, and the adjoint solve — runs in ONE Pallas
    grid pass over channels-major (rows, M) response rows; the only
    XLA-side per-step work is the tap->response MXU matmul against the
    precomputed DFT basis (and its transpose for the tap gradient) plus
    the Adam update.  The frozen room response and rhs = room x input
    are hoisted out of the scan (computed once per call, in-trace).

    Loss semantics are identical to the module-graph path
    ``mean((|Shell(FFT -> Recursion(room, mixer))(x)| - t)^2)`` — bench
    gates the two against each other.  Requires batch size 1 and an
    identity-mapped FIR mixer feedback (the AA topology,
    reference e8_active_acoustics.py:671-750).

    multi signature: ``multi(m, o, x, t, er, ei, k)`` — pass the
    returned (er, ei) basis through jit as arguments (they are large
    frozen operands; keeping them out of the trace avoids constant
    embedding)."""
    import optax

    from flamo_tpu.core import masked_optimizer
    from flamo_tpu.ops.pallas_solve import pallas_aa_tf_mse

    tx = masked_optimizer(optax.adam(lr), model)
    opt_state = tx.init(model)
    nfft = model.nfft
    loop = model.get_core()
    fb = loop.feedback
    order, L, N = fb.param.shape  # (taps, n_loudspeakers, n_mics)
    assert inputs.shape[0] == 1 and targets.shape[0] == 1, (
        "aa_fused_step requires batch size 1")
    er, ei = aa_dft_basis(order, nfft)

    def multi(m, o, x, t, er, ei, k):
        from flamo_tpu.ops import linop

        loop = m.get_core()
        room = loop.feedforward
        kind, Hraw = room.matrix_response()  # hoisted: once per call
        H = jax.lax.stop_gradient(
            linop.materialize(kind, Hraw, nfft // 2 + 1, N, L))
        X = jnp.fft.rfft(x, n=nfft, axis=1)[0]  # (M, L), hoisted
        hrows = jnp.transpose(H, (1, 2, 0)).reshape(N * L, -1)
        hr, hi = jnp.real(hrows), jnp.imag(hrows)
        rhs = jnp.einsum("mil,ml->im", H, X,
                         precision=jax.lax.Precision.HIGHEST)  # hoisted
        rr, ri = jnp.real(rhs), jnp.imag(rhs)
        tt = jnp.transpose(t[0], (1, 0))  # (N, M)

        def loss_fn(mm):
            fb = mm.get_core().feedback
            taps = fb.ir(fb.param)  # map applied, (order, L, N)
            env = jnp.asarray(fb.gamma, taps.dtype) ** jnp.arange(
                order, dtype=taps.dtype)
            tapsf = (taps * env[:, None, None]).reshape(order, L * N)
            # HIGHEST precision: the TPU's default bf16 matmul passes
            # cost ~1e-3 rel on G, which the 1e-3 parity gate rejects
            # (measured 6.4e-3 on the loss, 2026-08-17); the matmul is
            # FLOP-trivial so the 6-pass f32 emulation is free
            gr = jnp.matmul(tapsf.T, er,
                            precision=jax.lax.Precision.HIGHEST)
            gi = jnp.matmul(tapsf.T, ei,
                            precision=jax.lax.Precision.HIGHEST)
            return pallas_aa_tf_mse(hr, hi, gr, gi, rr, ri, tt,
                                    N=N, L=L, pivot=pivot)

        def body(carry, _):
            mm, oo = carry
            loss, g = jax.value_and_grad(loss_fn)(mm)
            up, oo = tx.update(g, oo, mm)
            return (optax.apply_updates(mm, up), oo), loss

        (m, o), losses = jax.lax.scan(body, (m, o), None, length=k)
        return m, o, losses[-1]

    return multi, opt_state, er, ei


def aa_fused_taps_step(model: system.Shell, inputs, targets,
                       lr: float = 1e-3, pivot: bool = False,
                       precision: str = "high"):
    """Build (jittable_multi, opt_state) for the AA magnitude-MSE
    workload on the TAPS-IN fused kernel
    (:func:`flamo_tpu.ops.pallas_aa_taps_tf_mse`): the DFT basis is
    built in-register from the iota phasor and the tap->response /
    response-cotangent->tap contractions run as MXU matmuls INSIDE the
    kernel, so no basis or mixer-response arrays exist in HBM at all —
    the only per-step XLA work left is the parameter map + Adam update.

    Profiled rationale (2026-08-19, vs :func:`aa_fused_step`): the
    response-rows path spent 115 us/step in four XLA basis matmuls +
    ~30 us pads, 3x its own Pallas kernel (49 us).  Those matmuls
    turned out PRECISION-PASS-BOUND, not bandwidth-bound (the 38 MB
    basis read hides under the 6 bf16 passes of HIGHEST) — an
    in-kernel HIGHEST variant measured SLOWER (236 us kernel, 3616
    steps/s vs 4387), so this builder defaults to ``precision='high'``
    (3 passes) where deleting the basis actually pays.

    ``multi(m, o, x, t, k)`` — no basis operands.  Loss semantics are
    identical to the module-graph path; bench gates the two against
    each other (same contract as aa_fused_step)."""
    import optax

    from flamo_tpu.core import masked_optimizer
    from flamo_tpu.ops.pallas_solve import pallas_aa_taps_tf_mse

    tx = masked_optimizer(optax.adam(lr), model)
    opt_state = tx.init(model)
    nfft = model.nfft
    loop = model.get_core()
    fb = loop.feedback
    order, L, N = fb.param.shape  # (taps, n_loudspeakers, n_mics)
    assert inputs.shape[0] == 1 and targets.shape[0] == 1, (
        "aa_fused_taps_step requires batch size 1")

    def multi(m, o, x, t, k):
        from flamo_tpu.ops import linop

        loop = m.get_core()
        room = loop.feedforward
        kind, Hraw = room.matrix_response()  # hoisted: once per call
        H = jax.lax.stop_gradient(
            linop.materialize(kind, Hraw, nfft // 2 + 1, N, L))
        X = jnp.fft.rfft(x, n=nfft, axis=1)[0]  # (M, L), hoisted
        hrows = jnp.transpose(H, (1, 2, 0)).reshape(N * L, -1)
        hr, hi = jnp.real(hrows), jnp.imag(hrows)
        rhs = jnp.einsum("mil,ml->im", H, X,
                         precision=jax.lax.Precision.HIGHEST)  # hoisted
        rr, ri = jnp.real(rhs), jnp.imag(rhs)
        tt = jnp.transpose(t[0], (1, 0))  # (N, M)

        def loss_fn(mm):
            fb = mm.get_core().feedback
            taps = fb.ir(fb.param)  # map applied, (order, L, N)
            env = jnp.asarray(fb.gamma, taps.dtype) ** jnp.arange(
                order, dtype=taps.dtype)
            tw = (taps * env[:, None, None]).reshape(order, L * N)
            return pallas_aa_taps_tf_mse(hr, hi, tw, rr, ri, tt,
                                         N=N, L=L, nfft=nfft, pivot=pivot,
                                         precision=precision)

        def body(carry, _):
            mm, oo = carry
            loss, g = jax.value_and_grad(loss_fn)(mm)
            up, oo = tx.update(g, oo, mm)
            return (optax.apply_updates(mm, up), oo), loss

        (m, o), losses = jax.lax.scan(body, (m, o), None, length=k)
        return m, o, losses[-1]

    return multi, opt_state


def _charpoly_rows(ar, ai, N: int):
    """Faddeev-LeVerrier characteristic-polynomial coefficients in ROWS
    layout: ``ar``/``ai`` real ``(N, N, B)`` matrix entries with the
    batch (bin) axis LAST -> coefficient rows ``(cr, ci)`` each
    ``(N, B)`` such that ``p(z) = z^N + c[0] z^{N-1} + ... + c[N-1]``.

    Twin of :func:`flamo_tpu.functional.charpoly` for the TPU hot path:
    (B, N, N)-major layouts pay (8, 128)-padded tiles for small N
    (~30x bandwidth waste — the profiled cost of the eigenvalue
    training step, 2026-08-18), while rows keep every multiply-add a
    full-lane VPU op that XLA fuses.  The explicit multiply-reduce
    matmuls are exact f32 (no bf16 MXU passes), matching charpoly's
    Precision.HIGHEST requirement by construction."""
    eyeb = jnp.eye(N, dtype=ar.dtype)[..., None]

    def tr(mr, mi):
        return ((mr * eyeb).sum((0, 1)), (mi * eyeb).sum((0, 1)))

    def matmul(xr, xi):
        # (A @ X)[i, j, b] = sum_l A[i, l, b] X[l, j, b]
        rr = (ar[:, :, None, :] * xr[None] - ai[:, :, None, :] * xi[None]
              ).sum(axis=1)
        ri = (ar[:, :, None, :] * xi[None] + ai[:, :, None, :] * xr[None]
              ).sum(axis=1)
        return rr, ri

    mkr, mki = ar, ai
    tr_r, tr_i = tr(mkr, mki)
    cr, ci = -tr_r, -tr_i
    crows = [cr]
    cirows = [ci]
    for k in range(2, N + 1):
        xr = mkr + eyeb * cr
        xi = mki + eyeb * ci
        mkr, mki = matmul(xr, xi)
        tr_r, tr_i = tr(mkr, mki)
        cr, ci = -tr_r / k, -tr_i / k
        crows.append(cr)
        cirows.append(ci)
    return jnp.stack(crows), jnp.stack(cirows)


def _sort_rows(x):
    """Ascending sort of an (N, B) array along axis 0 by odd-even
    transposition (N passes of min/max row swaps) — branch-free,
    lanes-major, and its VJP routes cotangents through the same
    selects (matching jnp.sort's permutation pullback for distinct
    values)."""
    N = x.shape[0]
    rows = [x[i] for i in range(N)]
    for p in range(N):
        for i in range(p % 2, N - 1, 2):
            lo = jnp.minimum(rows[i], rows[i + 1])
            hi = jnp.maximum(rows[i], rows[i + 1])
            rows[i], rows[i + 1] = lo, hi
    return jnp.stack(rows)


def aa_evs_train_step(aa: "ActiveAcoustics", target_evs, lr: float = 1e-3,
                      iter_num: int = 30, masks=None, key=None):
    """Build (jittable_multi, opt_state, er, ei) for the reference's TRUE
    active-acoustics training objective: eigenvalue-magnitude MSE over
    cycling bin partitions of the feedback-loop matrix
    (optimize.mse_evs semantics, reference
    e8_active_acoustics.py:564-621, 671-739 — trainee is the virtual
    room's FIR matrix ``U``).

    Fully on-device: the loop matrix is composed per partition with
    linop algebra (``F_MM[idx] = H_LM[idx] diag((R G)[idx]) U(idx)``,
    where ``U(idx)`` comes from one MXU matmul of the taps against the
    partition's slice of the rfft DFT basis), and the eigenvalues come
    from the char-poly + Durand-Kerner solver — the axon TPU rejects
    host callbacks, so this objective could not previously train on
    that hardware at all.

    Everything per-step is laid out LANES-MAJOR (bins on the last
    axis): the 2026-08-18 profile of the matrices-major implementation
    showed ~35 XLA fusions of 16-18 us each — (P, 4, 4)/(P, 4, 13)
    arrays with tiny minor dims pay (8, 128)-padded tiles, ~30x
    bandwidth waste (the same pathology as the AA magnitude step).
    Here the frozen rows (H_LM * diag(RG), targets, DFT basis) are
    pre-PERMUTED once into partition order, each step takes a
    contiguous ``dynamic_slice`` window (no per-step gathers), the
    4x4-per-bin char-poly runs as full-lane multiply-reduces
    (:func:`_charpoly_rows`), and the root iteration is the in-register
    Pallas kernel (functional.poly_roots_rows).

    ``multi(m, o, er, ei, tg, step0, k)`` scans ``k`` steps starting at
    global step index ``step0`` (the partition cycles with the step
    index, matching mse_evs) and returns ``(m, o, losses)`` with the
    full ``(k,)`` per-step loss history.  ``m`` is the F_MM shell; only
    trainable leaves (U) receive updates (masked Adam).  ``masks`` lets
    the caller share partitions with an ``optimize.mse_evs`` criterion
    (pass its ``mask_indices``) so the two paths are step-for-step
    comparable; by default fresh partitions are generated."""
    import optax

    from flamo_tpu.core import masked_optimizer
    from flamo_tpu.functional import poly_roots_rows
    from flamo_tpu.optimize.utils import generate_partitions

    model = aa.F_MM
    core = model.get_core()
    U = core["U"]
    nfft = model.nfft
    M = nfft // 2 + 1
    order, n_L, n_M = U.param.shape
    n_samples = int(np.ceil(M / iter_num))
    if masks is None:
        masks = generate_partitions(jnp.arange(M), n_samples, 1, key=key)
    else:
        masks = jnp.asarray(masks)
        n_samples = int(masks.shape[1])
    n_parts = int(masks.shape[0])
    # one flat partition-order permutation; step i's bins are the
    # contiguous window [ (i % n_parts) * n_samples, +n_samples )
    perm = np.asarray(masks).reshape(-1)

    tx = masked_optimizer(optax.adam(lr), model)
    opt_state = tx.init(model)
    er, ei = aa_dft_basis(order, nfft)
    # pre-permute the DFT basis on host: jit then ships the
    # already-partition-ordered operand and steps only slice it
    er, ei = er[:, perm], ei[:, perm]
    hp = jax.lax.Precision.HIGHEST

    def multi(m, o, er, ei, tg, step0, k):
        core = m.get_core()
        # frozen per-call hoists (in-trace, once per call): permuted
        # lanes-major rows of H_LM * diag(R G) and the sorted targets
        kH, H = core["H_LM"].matrix_response()
        from flamo_tpu.ops import linop

        H = jax.lax.stop_gradient(
            linop.materialize(kH, H, M, n_M, n_L))  # (M, n_M, n_L)
        kR, R = core["R"].matrix_response()
        kG, G = core["G"].matrix_response()
        assert kR == linop.DIAG and kG == linop.DIAG
        rg = jax.lax.stop_gradient(
            jnp.broadcast_to(R * G, (M, n_L)))  # (M, n_L)
        Hrg = jnp.transpose(H * rg[:, None, :], (1, 2, 0)).reshape(
            n_M * n_L, M)[:, perm]
        hr_all, hi_all = jnp.real(Hrg), jnp.imag(Hrg)
        tg_all = jnp.sort(tg, axis=-1).T[:, perm]  # (n_M, Mp)

        def step_loss(mm, i):
            start = (i % n_parts) * n_samples

            def win(a):
                return jax.lax.dynamic_slice_in_dim(a, start, n_samples,
                                                    axis=1)

            hr = win(hr_all).reshape(n_M, 1, n_L, n_samples)
            hi = win(hi_all).reshape(n_M, 1, n_L, n_samples)
            tgw = win(tg_all)  # (n_M, P)
            Um = mm.get_core()["U"]
            env = jnp.asarray(Um.gamma, Um.param.dtype) ** jnp.arange(
                order, dtype=Um.param.dtype)
            taps = (Um.ir(Um.param) * env[:, None, None]).reshape(
                order, n_L * n_M)
            # the only MXU work: taps -> partition response rows
            ur = jnp.matmul(taps.T, win(er), precision=hp)
            ui = jnp.matmul(taps.T, win(ei), precision=hp)
            # fm[i, j, b] = sum_l Hrg[i, l, b] U[l, j, b]  (rows)
            urt = jnp.transpose(ur.reshape(n_L, n_M, n_samples),
                                (1, 0, 2))[None]  # (1, j, l, b) = U[l, j]
            uit = jnp.transpose(ui.reshape(n_L, n_M, n_samples),
                                (1, 0, 2))[None]
            fr = (hr * urt - hi * uit).sum(axis=2)  # (i, j, b)
            fi = (hr * uit + hi * urt).sum(axis=2)
            # spectrum-center and scale (eigvals_dk semantics)
            eyeb = jnp.eye(n_M, dtype=fr.dtype)[..., None]
            mur = (fr * eyeb).sum((0, 1)) / n_M
            mui = (fi * eyeb).sum((0, 1)) / n_M
            br = fr - eyeb * mur
            bi = fi - eyeb * mui
            s = jnp.maximum(
                jnp.sqrt((br * br + bi * bi).sum((0, 1)) / n_M), 1e-30)
            cr, ci = _charpoly_rows(br / s, bi / s, n_M)
            zr, zi = poly_roots_rows(cr, ci)
            evr = zr * s + mur
            evi = zi * s + mui
            mag = _sort_rows(jnp.sqrt(evr * evr + evi * evi))
            return jnp.mean((mag - tgw) ** 2)

        def body(carry, i):
            mm, oo = carry
            loss, g = jax.value_and_grad(step_loss)(mm, i)
            up, oo = tx.update(g, oo, mm)
            return (optax.apply_updates(mm, up), oo), loss

        (m, o), losses = jax.lax.scan(body, (m, o),
                                      step0 + jnp.arange(k))
        return m, o, losses

    return multi, opt_state, er, ei


def aa_evs_fit(aa: "ActiveAcoustics", target_evs, n_steps: int,
               lr: float = 1e-3, iter_num: int = 30, masks=None,
               steps_per_call: int = 400, key=None):
    """Run the lanes-major fused eigenvalue training
    (:func:`aa_evs_train_step`) end to end: build, jit, scan ``n_steps``
    optimizer steps in <= ``steps_per_call`` chunks, and return
    ``(trained F_MM shell, per-step loss history)``.

    This is the paved-road entry the e8 active-acoustics example uses on
    accelerators (7076 steps/s on the tunnel vs ~1/s through the eager
    Trainer graph path, BENCH.md); semantics are ``optimize.mse_evs``
    over cycling bin partitions, trainee ``U``
    (reference e8_active_acoustics.py:564-621, 671-739).  Pass the
    criterion's ``mask_indices`` as ``masks`` so the partition schedule
    matches a Trainer run step for step.  Pull the result back with
    ``aa.adopt(shell)``."""
    from flamo_tpu.utils import to_device

    multi, opt_state, er, ei = aa_evs_train_step(
        aa, target_evs, lr=lr, iter_num=iter_num, masks=masks, key=key)
    m, o, er, ei, tg = to_device(
        (aa.F_MM, opt_state, jnp.asarray(er), jnp.asarray(ei),
         jnp.asarray(target_evs)))
    jm = jax.jit(multi, static_argnums=(6,), donate_argnums=(0, 1))
    history = []
    step0 = 0
    while step0 < n_steps:
        k = min(steps_per_call, n_steps - step0)
        m, o, losses = jm(m, o, er, ei, tg, jnp.asarray(step0), k)
        history.append(np.asarray(losses))
        step0 += k
    return m, np.concatenate(history)
