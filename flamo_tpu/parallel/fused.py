"""Fused Pallas step kernels under multi-device sharding.

The single-chip speed records live in the fused Mosaic step kernels
(ops.pallas_solve); the multi-chip scaling axis is the frequency-bin
shard (parallel.mesh).  This module composes the two: the colorless-FDN
fused step kernel (``pallas_fdn_tf_mse`` — solve + loss + adjoint in one
grid pass) runs PER SHARD inside a ``shard_map`` over a 1-D 'bins' mesh.

How the kernel's grid interacts with GSPMD sharding: ``shard_map``
splits the padded bin axis into equal per-device blocks BEFORE the
kernel is traced, so each device lowers its own ``pallas_call`` whose
grid covers only the local ``M/n`` bins — the kernel itself is
sharding-oblivious (its operands carry no global bin indices; the delay
responses ``D``, input spectrum ``X`` and target ``t`` arrive already
sliced).  Zero-padded bins are exact no-ops (``D = 0`` rows make the
loop matrix the identity and ``t = 0`` matches the resulting zero
magnitude), so the global loss is the psum of per-shard partial sums.
The only collectives are that scalar psum and the gradient psums that
``shard_map`` transposition inserts for the replicated parameter
operands ``U``/``b``/``c`` — both ride ICI.

Kernels that derive bin indices from ``pl.program_id`` (the SOS-cascade
family computes its phasor from iota) are NOT shard-oblivious: under
``shard_map`` each device's grid restarts at program 0, so the phasor
must be shifted by the shard's global bin offset.  Those kernels take a
``bin_offset`` operand for exactly this (ops.pallas_solve._bin_phasor);
the attenuated-FDN and AA-taps wrappers below pass
``axis_index * local_M``.
``pallas_fdn_tf_mse`` takes explicit per-bin operands, so it composes
as-is.  tests/test_parallel.py lockstep-asserts both against the
unsharded kernels on the 8-virtual-device CPU mesh (interpret mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from flamo_tpu.core import masked_optimizer
from flamo_tpu.parallel.dp import shard_map

__all__ = ["bins_sharded_fused_loss", "make_bins_sharded_fused_step",
           "bins_sharded_attenuated_loss",
           "make_bins_sharded_attenuated_step",
           "make_bins_sharded_aa_taps_step",
           "make_bins_sharded_evs_step",
           "seed_bins_sharded_fused_loss",
           "make_seed_bins_sharded_fused_step",
           "masked_sharded_sfdn_loss",
           "make_masked_sharded_sfdn_step"]


def bins_sharded_fused_loss(model, X, t, mesh, axis_name: str = "bins",
                            pivot: bool = True,
                            sparsity_weight: float = 0.2):
    """Colorless fused-step loss (mse through ``pallas_fdn_tf_mse`` +
    sparsity) with the bin axis sharded over ``mesh[axis_name]``.

    ``X``/``t`` are the (M,) input spectrum and target magnitude; the
    bin axis is zero-padded up to a multiple of the mesh size and each
    shard runs the fused kernel on its local block.  Numerically
    lockstep with :func:`models.colorless_fdn.colorless_loss_fused_step`
    up to f32 reduction order.  Differentiable in the model (delays
    frozen, as in the colorless workload)."""
    from flamo_tpu.models.colorless_fdn import (_SPARSITY,
                                                extract_siso_tf_operands)
    from flamo_tpu.ops.pallas_solve import pallas_fdn_tf_mse

    n = mesh.shape[axis_name]
    D, U, b, c = extract_siso_tf_operands(model)
    M = D.shape[0]
    Mp = ((M + n - 1) // n) * n
    pad = Mp - M
    if pad:
        D = jnp.pad(D, ((0, pad), (0, 0)))
        X = jnp.pad(X, (0, pad))
        t = jnp.pad(t, (0, pad))

    def shard_fn(D, X, t, U, b, c):
        # kernel divides its partial sum by the LOCAL bin count; undo,
        # psum, renormalize by the true global M
        part = pallas_fdn_tf_mse(D, U, b, c, X, t, with_dbar=False,
                                 pivot=pivot)
        return jax.lax.psum(part * D.shape[0], axis_name) / M

    loss = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name), P(axis_name),
                  P(), P(), P()),
        out_specs=P(), check_vma=False,
    )(D, X, t, U, b, c)
    return loss + sparsity_weight * _SPARSITY(None, None, model)


def bins_sharded_attenuated_loss(model, X, t, mesh,
                                 axis_name: str = "bins",
                                 pivot: bool = False):
    """Attenuated-FDN fused-step loss (magnitude MSE through
    ``pallas_fdn_sos_tf_mse``) with the bin axis sharded over
    ``mesh[axis_name]``.

    The SOS-cascade attenuation inside the kernel derives its phasor
    from the grid's program id, so each shard passes its global bin
    offset (``axis_index * local_M``) as the kernel's ``bin_offset``
    operand; the delay responses ``D``, input spectrum ``X`` and target
    ``t`` arrive pre-sliced and zero-padded bins are exact no-ops.  The
    SOS taps, mixer ``U`` and the in/out gains are replicated — their
    cotangents arrive via the gradient psums ``shard_map`` transposition
    inserts.  Numerically lockstep with
    :func:`models.attenuated_fdn.attenuated_loss_fused_step` up to f32
    reduction order."""
    from flamo_tpu.models.attenuated_fdn import \
        extract_attenuated_operands
    from flamo_tpu.ops.pallas_solve import pallas_fdn_sos_tf_mse

    n = mesh.shape[axis_name]
    D, bt, at, U, b, c = extract_attenuated_operands(model)
    nfft = model.nfft
    M = D.shape[0]
    Mp = ((M + n - 1) // n) * n
    pad = Mp - M
    if pad:
        D = jnp.pad(D, ((0, pad), (0, 0)))
        X = jnp.pad(X, (0, pad))
        t = jnp.pad(t, (0, pad))
    loop = model.get_core().feedback_loop
    ff_trainable = bool(getattr(loop.feedforward, "trainable", False))

    def shard_fn(D, X, t, bt, at, U, b, c):
        loc = D.shape[0]
        off = (jax.lax.axis_index(axis_name) * loc).astype(jnp.float32)
        part = pallas_fdn_sos_tf_mse(
            D, bt, at, U, b, c, X, t, nfft=nfft,
            with_dbar=ff_trainable, pivot=pivot, bin_offset=off)
        # kernel normalizes by the LOCAL bin count; undo, psum,
        # renormalize by the true global M
        return jax.lax.psum(part * loc, axis_name) / M

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name), P(axis_name),
                  P(), P(), P(), P(), P()),
        out_specs=P(), check_vma=False,
    )(D, X, t, bt, at, U, b, c)


def make_bins_sharded_attenuated_step(model, mesh, lr: float = 1e-4,
                                      axis_name: str = "bins",
                                      pivot: bool = False):
    """Build ``(jittable_step, opt_state)`` for the attenuated-FDN
    workload with the fused SOS step kernel bins-sharded over ``mesh``
    (parameters and optimizer state replicated).  step(model, opt_state,
    inputs, targets) takes the canonical (1, T, 1) impulse / (1, M, 1)
    target shapes of the workload."""
    tx = masked_optimizer(optax.adam(lr), model)
    opt_state = tx.init(model)
    nfft = model.nfft

    def step(model, opt_state, inputs, targets):
        X = jnp.fft.rfft(inputs[0, :, 0], n=nfft)

        def loss_fn(m):
            return bins_sharded_attenuated_loss(
                m, X, targets[0, :, 0], mesh, axis_name=axis_name,
                pivot=pivot)

        loss, grads = jax.value_and_grad(loss_fn)(model)
        updates, opt_state = tx.update(grads, opt_state, model)
        return optax.apply_updates(model, updates), opt_state, loss

    return step, opt_state


def make_bins_sharded_aa_taps_step(model, mesh, lr: float = 1e-3,
                                   axis_name: str = "bins",
                                   pivot: bool = False,
                                   precision: str = "high"):
    """Build ``(jittable_step, opt_state)`` for the active-acoustics
    magnitude-MSE workload with the taps-in fused kernel
    (:func:`ops.pallas_solve.pallas_aa_taps_tf_mse`) bins-sharded over
    ``mesh[axis_name]``.

    Per step the frozen room response rows and the rhs spectrum are
    hoisted once (stop-gradient, exactly like
    :func:`models.active_acoustics.aa_fused_taps_step`), zero-padded to
    a multiple of the mesh size (zero bins are exact no-ops: zero rhs
    and zero target give zero loss and zero cotangents), and sliced per
    shard; the trainable mixer taps ``tw`` are replicated and their
    cotangent arrives via the gradient psum ``shard_map`` transposition
    inserts.  The kernel builds its DFT basis in-register from the iota
    phasor, so each shard passes ``axis_index * local_M`` as
    ``bin_offset``.  ``step(model, opt_state, inputs, targets)`` takes
    the canonical (1, T, L) impulse / (1, M, N) target shapes."""
    from flamo_tpu.ops.pallas_solve import pallas_aa_taps_tf_mse

    tx = masked_optimizer(optax.adam(lr), model)
    opt_state = tx.init(model)
    nfft = model.nfft
    fb0 = model.get_core().feedback
    order, L, N = fb0.param.shape  # (taps, n_loudspeakers, n_mics)
    n = mesh.shape[axis_name]
    M = nfft // 2 + 1
    Mp = ((M + n - 1) // n) * n

    def step(m, o, x, t):
        from flamo_tpu.ops import linop

        loop = m.get_core()
        kind, Hraw = loop.feedforward.matrix_response()
        H = jax.lax.stop_gradient(linop.materialize(kind, Hraw, M, N, L))
        X = jnp.fft.rfft(x, n=nfft, axis=1)[0]  # (M, L)
        hrows = jnp.transpose(H, (1, 2, 0)).reshape(N * L, -1)
        rhs = jnp.einsum("mil,ml->im", H, X,
                         precision=jax.lax.Precision.HIGHEST)
        rows = (jnp.real(hrows), jnp.imag(hrows), jnp.real(rhs),
                jnp.imag(rhs), jnp.transpose(t[0], (1, 0)))
        rows = tuple(jnp.pad(r, ((0, 0), (0, Mp - M))) if Mp > M else r
                     for r in rows)

        def shard_fn(hr, hi, rr, ri, tt, tw):
            loc = rr.shape[-1]
            off = (jax.lax.axis_index(axis_name) * loc).astype(jnp.float32)
            part = pallas_aa_taps_tf_mse(
                hr, hi, tw, rr, ri, tt, N=N, L=L, nfft=nfft, pivot=pivot,
                precision=precision, bin_offset=off)
            # kernel normalizes by the LOCAL (bins * N) count; undo,
            # psum, renormalize by the true global count
            return jax.lax.psum(part * (loc * N), axis_name) / (M * N)

        def loss_fn(mm):
            fb = mm.get_core().feedback
            taps = fb.ir(fb.param)  # map applied, (order, L, N)
            env = jnp.asarray(fb.gamma, taps.dtype) ** jnp.arange(
                order, dtype=taps.dtype)
            tw = (taps * env[:, None, None]).reshape(order, L * N)
            return shard_map(
                shard_fn, mesh=mesh,
                in_specs=(P(None, axis_name),) * 5 + (P(),),
                out_specs=P(), check_vma=False,
            )(*rows, tw)

        loss, grads = jax.value_and_grad(loss_fn)(m)
        updates, o = tx.update(grads, o, m)
        return optax.apply_updates(m, updates), o, loss

    return step, opt_state


def make_bins_sharded_fused_step(model, mesh, lr: float = 1e-3,
                                 axis_name: str = "bins",
                                 pivot: bool = True,
                                 sparsity_weight: float = 0.2):
    """Build ``(jittable_step, opt_state)`` for the colorless workload
    where the fused Pallas step kernel runs bins-sharded over ``mesh``
    (parameters and optimizer state replicated; gradient psums are the
    only parameter collectives).  step(model, opt_state, inputs,
    targets) takes the canonical (1, T, 1) impulse / (1, M, 1) target
    shapes of the workload."""
    tx = masked_optimizer(optax.adam(lr), model)
    opt_state = tx.init(model)
    nfft = model.nfft

    def step(model, opt_state, inputs, targets):
        X = jnp.fft.rfft(inputs[0, :, 0], n=nfft)

        def loss_fn(m):
            return bins_sharded_fused_loss(
                m, X, targets[0, :, 0], mesh, axis_name=axis_name,
                pivot=pivot, sparsity_weight=sparsity_weight)

        loss, grads = jax.value_and_grad(loss_fn)(model)
        updates, opt_state = tx.update(grads, opt_state, model)
        return optax.apply_updates(model, updates), opt_state, loss

    return step, opt_state


def make_bins_sharded_evs_step(aa, target_evs, mesh, lr: float = 1e-3,
                               iter_num: int = 30, masks=None,
                               axis_name: str = "bins", key=None):
    """The lanes-major active-acoustics EIGENVALUE training step
    (:func:`models.active_acoustics.aa_evs_train_step`) with each step's
    bin partition sharded over ``mesh[axis_name]`` — completes the
    multi-chip story for the fourth headline workload (VERDICT r4
    next #9).

    Layout: the pre-permuted lanes-major row operands (DFT basis,
    H_LM * diag(R G) rows, sorted targets) are reshaped partition-major
    ``(rows, n_parts, P)`` and the WITHIN-partition bin axis ``P``
    (zero-padded to a multiple of the mesh size) is sharded — step ``i``
    indexes partition ``i % n_parts`` locally on every device, so no
    step ever crosses a shard boundary.  Zero-padded bins are exact
    no-ops: zero basis columns give a zero loop matrix whose (centered,
    scaled) eigenvalue magnitudes are ~0 against a zero target, and
    their tap cotangents vanish through the zero basis columns.  Each
    shard runs the full char-poly + Durand-Kerner pipeline on its local
    bins; the scalar loss partial is psum'd (squared-error SUMS, so
    padding cancels exactly) and the trainable taps ``U`` are
    replicated — their cotangent arrives via the gradient psum
    ``shard_map`` transposition inserts.

    Returns ``(step, opt_state, er, ei)`` with
    ``step(m, o, er, ei, tg, i) -> (m, o, loss)`` — one optimizer step
    at global step index ``i`` (the partition cycles with ``i``,
    matching ``optimize.mse_evs``); lockstep with the unsharded
    ``aa_evs_train_step`` up to f32 reduction order
    (tests/test_parallel.py).  For a training LOOP use
    ``step.multi(m, o, er, ei, tg, step0, k)`` (same signature as the
    unsharded ``multi``; jit with ``static_argnums=(6,)``): it hoists
    the frozen full-M rows (H_LM materialization, diag(RG) product,
    partition-order gathers, target sort) ONCE per scanned call, where
    the single-step ``step`` must recompute them every call."""
    import numpy as np

    from flamo_tpu.functional import poly_roots_rows
    from flamo_tpu.models.active_acoustics import (_charpoly_rows,
                                                   _sort_rows,
                                                   aa_dft_basis)
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
    perm = np.asarray(masks).reshape(-1)
    n = mesh.shape[axis_name]
    Pp = ((n_samples + n - 1) // n) * n
    padP = Pp - n_samples

    def part_major(a):
        # (rows, n_parts * P) -> (rows, n_parts, Pp) zero-padded
        a = a.reshape(a.shape[0], n_parts, n_samples)
        if padP:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, padP)))
        return a

    tx = masked_optimizer(optax.adam(lr), model)
    opt_state = tx.init(model)
    er, ei = aa_dft_basis(order, nfft)
    er, ei = part_major(er[:, perm]), part_major(ei[:, perm])
    hp = jax.lax.Precision.HIGHEST

    def _hoist_frozen(m, tg):
        # frozen per-CALL hoists, same as the unsharded step: permuted
        # partition-major rows of H_LM * diag(R G) and the sorted
        # targets depend only on frozen modules, so a scanned training
        # call (`multi`) pays the materialization + gathers ONCE, never
        # per step (CLAUDE.md: no gathers on the hot path)
        from flamo_tpu.ops import linop

        core = m.get_core()
        kH, H = core["H_LM"].matrix_response()
        H = jax.lax.stop_gradient(
            linop.materialize(kH, H, M, n_M, n_L))  # (M, n_M, n_L)
        kR, R = core["R"].matrix_response()
        kG, G = core["G"].matrix_response()
        assert kR == linop.DIAG and kG == linop.DIAG
        rg = jax.lax.stop_gradient(jnp.broadcast_to(R * G, (M, n_L)))
        Hrg = jnp.transpose(H * rg[:, None, :], (1, 2, 0)).reshape(
            n_M * n_L, M)[:, perm]
        hr_all = part_major(jnp.real(Hrg))
        hi_all = part_major(jnp.imag(Hrg))
        tg_all = part_major(
            jnp.sort(tg, axis=-1).T[:, perm])  # (n_M, parts, Pp)
        return hr_all, hi_all, tg_all

    def _one_step(m, o, er, ei, hr_all, hi_all, tg_all, i):
        p_idx = jnp.asarray(i % n_parts)

        def shard_fn(hr_p, hi_p, tg_p, er_p, ei_p, taps, p_idx):
            def pick(a):
                return jax.lax.dynamic_index_in_dim(a, p_idx, axis=1,
                                                    keepdims=False)

            hr = pick(hr_p).reshape(n_M, 1, n_L, -1)
            hi = pick(hi_p).reshape(n_M, 1, n_L, -1)
            tgw = pick(tg_p)  # (n_M, Pl)
            erw, eiw = pick(er_p), pick(ei_p)  # (order, Pl)
            ur = jnp.matmul(taps.T, erw, precision=hp)
            ui = jnp.matmul(taps.T, eiw, precision=hp)
            Pl = erw.shape[-1]
            urt = jnp.transpose(ur.reshape(n_L, n_M, Pl), (1, 0, 2))[None]
            uit = jnp.transpose(ui.reshape(n_L, n_M, Pl), (1, 0, 2))[None]
            fr = (hr * urt - hi * uit).sum(axis=2)
            fi = (hr * uit + hi * urt).sum(axis=2)
            eyeb = jnp.eye(n_M, dtype=fr.dtype)[..., None]
            # double-where guard (CLAUDE.md): zero-padded bins would
            # hand the root solver p(z) = z^N, whose implicit-function
            # VJP divides by p'(0) = 0 — NaNs that poison the psum'd
            # gradient.  Padded bins instead solve a benign distinct
            # diagonal spectrum and are masked out of the loss (their
            # tap cotangents are exactly zero through the mask).
            gidx = jax.lax.axis_index(axis_name) * Pl + jnp.arange(Pl)
            valid = (gidx < n_samples).astype(fr.dtype)  # (Pl,)
            safe = eyeb * (1.0 + jnp.arange(n_M, dtype=fr.dtype)
                           )[:, None, None]
            fr = jnp.where(valid > 0, fr, safe)
            fi = jnp.where(valid > 0, fi, 0.0)
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
            # squared-error SUM masked to true bins, so padding cancels
            # exactly in the psum; the mean uses the TRUE bin count
            part = jnp.sum(((mag - tgw) ** 2) * valid[None])
            return jax.lax.psum(part, axis_name) / (n_M * n_samples)

        def loss_fn(mm):
            Um = mm.get_core()["U"]
            env = jnp.asarray(Um.gamma, Um.param.dtype) ** jnp.arange(
                order, dtype=Um.param.dtype)
            taps = (Um.ir(Um.param) * env[:, None, None]).reshape(
                order, n_L * n_M)
            return shard_map(
                shard_fn, mesh=mesh,
                in_specs=(P(None, None, axis_name),) * 5 + (P(), P()),
                out_specs=P(), check_vma=False,
            )(hr_all, hi_all, tg_all, er, ei, taps, p_idx)

        loss, grads = jax.value_and_grad(loss_fn)(m)
        updates, o = tx.update(grads, o, m)
        return optax.apply_updates(m, updates), o, loss

    def step(m, o, er, ei, tg, i):
        hr_all, hi_all, tg_all = _hoist_frozen(m, tg)
        return _one_step(m, o, er, ei, hr_all, hi_all, tg_all, i)

    def multi(m, o, er, ei, tg, step0, k):
        # scanned training call, mirroring the unsharded
        # aa_evs_train_step's `multi(m, o, er, ei, tg, step0, k)`:
        # hoists the frozen rows once, then scans k optimizer steps
        hr_all, hi_all, tg_all = _hoist_frozen(m, tg)

        def body(carry, i):
            m, o = carry
            m, o, loss = _one_step(m, o, er, ei, hr_all, hi_all, tg_all,
                                   step0 + i)
            return (m, o), loss

        (m, o), losses = jax.lax.scan(body, (m, o), jnp.arange(k))
        return m, o, losses

    step.multi = multi
    return step, opt_state, er, ei


def seed_bins_sharded_fused_loss(model, X, t, mesh,
                                 seed_axis: str = "seed",
                                 bins_axis: str = "bins",
                                 pivot: bool = True,
                                 sparsity_weight: float = 0.2):
    """Per-seed colorless fused-step losses over a 2-D ``seed x bins``
    mesh: ``model`` is a STACKED member pytree (leading seed dim on
    every array leaf, as built by ``tree_map(stack, *members)``), the
    member axis is sharded over ``mesh[seed_axis]`` and every member's
    bin axis over ``mesh[bins_axis]``.

    ONE ``shard_map`` over the full mesh: each device holds its
    members' slice of the (S, Mp, N) delay diagonals and runs the fused
    kernel per local member (``vmap`` of the Pallas call adds a grid
    dim); the loss partial psums over ``bins_axis`` only — members are
    independent, so nothing crosses ``seed_axis`` and the gradient
    transposition inserts the replicated-operand psums per member.
    Returns the (S,) per-member losses (mse + sparsity, lockstep with
    :func:`models.colorless_fdn.colorless_loss_fused_step` per member
    up to f32 reduction order)."""
    from flamo_tpu.models.colorless_fdn import (_SPARSITY,
                                                extract_siso_tf_operands)
    from flamo_tpu.ops.pallas_solve import pallas_fdn_tf_mse

    nb = mesh.shape[bins_axis]
    D, U, b, c = jax.vmap(extract_siso_tf_operands)(model)
    M = D.shape[1]
    Mp = ((M + nb - 1) // nb) * nb
    pad = Mp - M
    if pad:
        D = jnp.pad(D, ((0, 0), (0, pad), (0, 0)))
        X = jnp.pad(X, (0, pad))
        t = jnp.pad(t, (0, pad))

    def shard_fn(D, X, t, U, b, c):
        def one(Di, Ui, bi, ci):
            part = pallas_fdn_tf_mse(Di, Ui, bi, ci, X, t,
                                     with_dbar=False, pivot=pivot)
            return jax.lax.psum(part * Di.shape[0], bins_axis) / M

        return jax.vmap(one)(D, U, b, c)

    mse = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(seed_axis, bins_axis, None), P(bins_axis),
                  P(bins_axis), P(seed_axis, None, None),
                  P(seed_axis, None), P(seed_axis, None)),
        out_specs=P(seed_axis), check_vma=False,
    )(D, X, t, U, b, c)
    sp = jax.vmap(lambda m: _SPARSITY(None, None, m))(model)
    return mse + sparsity_weight * sp


def make_seed_bins_sharded_fused_step(model, mesh, lr: float = 1e-3,
                                      seed_axis: str = "seed",
                                      bins_axis: str = "bins",
                                      pivot: bool = True):
    """Build ``(jittable_step, opt_state)`` for vmapped multi-seed
    colorless training through the fused step kernel on a 2-D
    ``seed x bins`` mesh (:func:`seed_bins_sharded_fused_loss`).

    ``model`` is the stacked member pytree; the optimizer is the masked
    Adam vmapped per member (member parameters and moments live on
    their seed row, replicated over ``bins``).  The grad of the SUMMED
    per-member losses gives each member its own independent gradient.
    ``step(model, opt_state, inputs, targets)`` takes the canonical
    (1, T, 1) impulse / (1, M, 1) target shapes and returns the (S,)
    per-member loss vector."""
    tx = masked_optimizer(optax.adam(lr), model)
    opt_state = jax.vmap(tx.init)(model)
    nfft = model.nfft

    def step(m, o, x, t):
        X = jnp.fft.rfft(x[0, :, 0], n=nfft)

        def loss_fn(mm):
            losses = seed_bins_sharded_fused_loss(
                mm, X, t[0, :, 0], mesh, seed_axis=seed_axis,
                bins_axis=bins_axis, pivot=pivot)
            return jnp.sum(losses), losses

        (_, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(m)
        updates, o = jax.vmap(tx.update)(grads, o, m)
        return optax.apply_updates(m, updates), o, losses

    return step, opt_state


def masked_sharded_sfdn_loss(model, X, targets, mask, mesh,
                             axis_name: str = "bins",
                             sparsity_weight: float = 0.2,
                             solve_method: str = "ge_cached"):
    """The scattering-FDN masked objective
    (:func:`models.scattering_fdn.sfdn_masked_loss`) with the step's
    MASKED bins sharded over ``mesh[axis_name]`` — the multi-chip form
    of the fourth workload family.

    The frequency-dependent responses are computed once in the global
    program (the scattering rfft is the same on every device) and
    gathered at ``mask`` BEFORE the shard_map, so only the per-bin
    assemble + (pivoted) solve + loss shards; the gains/solve operands
    are replicated and their cotangents arrive via the gradient psums
    ``shard_map`` transposition inserts.  Zero-padded bins are exact
    no-ops (zero D rows make the loop matrix the identity and a zero
    rhs, so est = 0 against a zero-padded target).  Lockstep with the
    unsharded masked loss up to f32 reduction order
    (tests/test_parallel.py)."""
    core = model.get_core()
    loop = core.feedback_loop
    S = loop.feedback.response_at(mask)           # (P, N, N) complex
    D = loop.feedforward.response_at(mask)        # (P, N) complex diag
    gi = core.input_gain.response()               # (N, 1) complex
    go = core.output_gain.response()              # (1, N) complex
    Xm = X[0, mask, 0]                            # (P,)
    tm = targets[0, mask, 0]                      # (P,)
    P_total = mask.shape[0]
    n = mesh.shape[axis_name]
    Pp = ((P_total + n - 1) // n) * n
    pad = Pp - P_total
    if pad:
        S = jnp.pad(S, ((0, pad), (0, 0), (0, 0)))
        D = jnp.pad(D, ((0, pad), (0, 0)))
        Xm = jnp.pad(Xm, (0, pad))
        tm = jnp.pad(tm, (0, pad))

    from flamo_tpu.ops.solve import closed_loop_solve

    def shard_fn(S, D, Xm, tm, gi, go):
        N = D.shape[-1]
        eye = jnp.eye(N, dtype=S.dtype)
        A = eye - D[:, :, None] * S               # (P_loc, N, N)
        rhs = D * (gi[None, :, 0] * Xm[:, None])  # (P_loc, N)
        y = closed_loop_solve(A, rhs, method=solve_method)
        est = jnp.abs(jnp.einsum("n,pn->p", go[0], y))
        part = jnp.sum((est - tm) ** 2)
        return jax.lax.psum(part, axis_name) / P_total

    loss = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis_name, None, None), P(axis_name, None),
                  P(axis_name), P(axis_name), P(), P()),
        out_specs=P(), check_vma=False,
    )(S, D, Xm, tm, gi, go)
    from flamo_tpu.models.scattering_fdn import _SPARSITY

    return loss + sparsity_weight * _SPARSITY(None, None, model)


def make_masked_sharded_sfdn_step(model, mesh, lr: float = 1e-3,
                                  n_samples: int = 2000,
                                  sparsity_weight: float = 0.2,
                                  axis_name: str = "bins", key=None,
                                  solve_method: str = "ge_cached"):
    """Build ``(jittable_step, opt_state)`` for the scattering-FDN
    workload with each step's masked bins sharded over
    ``mesh[axis_name]`` (see :func:`masked_sharded_sfdn_loss`).

    Drop-in step signature (matches
    :func:`models.scattering_fdn.sfdn_masked_train_step`):
    ``step(model, opt_state, inputs, targets, i)`` — ``i`` selects and
    in-graph regenerates the bin-partition mask, so the schedule is the
    unsharded paths'."""
    from flamo_tpu.optimize.loss import masked_mse_loss

    tx = masked_optimizer(optax.adam(lr), model)
    opt_state = tx.init(model)
    ml = masked_mse_loss(nfft=model.nfft, n_samples=n_samples, n_sets=1,
                         regenerate_mask=True, key=key)

    def step(model, opt_state, inputs, targets, i):
        mask = ml.masks_for_cycle(i // ml.n_masks)[i % ml.n_masks]
        X = model.input_layer(inputs)

        def loss_fn(m):
            return masked_sharded_sfdn_loss(
                m, X, targets, mask, mesh, axis_name=axis_name,
                sparsity_weight=sparsity_weight,
                solve_method=solve_method)

        loss, grads = jax.value_and_grad(loss_fn)(model)
        updates, opt_state = tx.update(grads, opt_state, model)
        return optax.apply_updates(model, updates), opt_state, loss

    return step, opt_state
