"""Trainer (counterpart of reference flamo/optimize/trainer.py).

Same control surface as the reference — Adam + StepLR-equivalent schedule,
weighted multi-criterion with ``requires_model``, per-epoch checkpointing and
early stopping — but the whole train step (forward through the jitted model
graph, all losses, backward, masked Adam update) compiles to ONE XLA program.
Non-trainable parameters (``requires_grad=False`` modules) are frozen by
zeroing their gradients through :func:`flamo_tpu.core.trainable_mask`.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flamo_tpu.core import masked_optimizer, trainable_mask


class Trainer:
    """Training driver for differentiable frequency-domain systems
    (reference trainer.py:9-313).

    Arguments mirror the reference: net, max_epochs, lr, patience,
    patience_delta, step_size, step_factor, log, train_dir.
    """

    def __init__(self, net, max_epochs: int = 10, lr: float = 1e-3,
                 patience: int = 5, patience_delta: float = 0.01,
                 step_size: int = 50, step_factor: float = 0.1,
                 log: bool = True, train_dir: Optional[str] = None,
                 device: Optional[str] = None,
                 profile_dir: Optional[str] = None,
                 fused: str = "auto", **kwargs):
        self.net = net
        # fused-kernel dispatch: 'auto' recognizes kernel-compatible
        # (topology, criteria) combinations on accelerators and swaps the
        # step objective for the fused Pallas kernel behind a one-time
        # numeric parity gate (models/dispatch.py); 'off' keeps the
        # module-graph path; 'force' gates even on the CPU backend
        # (interpreter-mode kernels — tests only)
        assert fused in ("auto", "off", "force")
        self.fused = fused
        self.fused_path = None
        self._fused_loss = None
        self._fused_gated = False
        self.max_epochs = max_epochs
        self.lr = lr
        self.patience = patience
        self.patience_delta = patience_delta
        self.step_size = step_size
        self.step_factor = step_factor
        self.min_val_loss = float("inf")
        self.counter = 0
        self.log = log
        if self.log:
            assert train_dir is not None and os.path.isdir(train_dir), (
                "The directory specified in train_dir does not exist."
            )
        self.train_dir = train_dir
        self.profile_dir = profile_dir
        self.n_loss = 0
        self.criterion, self.alpha, self.requires_model = [], [], []
        self._jitted_step = None
        self._jitted_valid = None
        self._opt_state = None
        self._step_count = 0
        # usable before train() for direct train_step/fit_scan callers
        self.train_loss, self.valid_loss = [], []
        self.train_loss_log, self.valid_loss_log = {}, {}

    # ------------------------------------------------------------------
    def register_criterion(self, criterion, alpha: float = 1,
                           requires_model: bool = False):
        """Register a loss with weight ``alpha`` (reference trainer.py:87-101)."""
        self.criterion.append(criterion)
        self.alpha.append(alpha)
        self.requires_model.append(requires_model)
        self.n_loss += 1

    # ------------------------------------------------------------------
    def _loss_name(self, criterion):
        return type(criterion).__name__

    def _total_loss(self, model, inputs, targets, step, loss_state):
        if self._fused_loss is not None:
            return self._fused_loss(model, inputs, targets, step,
                                    loss_state)
        est = model(inputs)
        total = 0.0
        per_loss = []
        si = 0
        for alpha, criterion, requires_model in zip(
                self.alpha, self.criterion, self.requires_model):
            args = [est, targets]
            kwargs = {}
            if requires_model:
                args.append(model)
            if getattr(criterion, "stateful", False):
                kwargs["step"] = step
                kwargs["state"] = loss_state[si]
                si += 1
            value = criterion(*args, **kwargs)
            per_loss.append(value)
            total = total + alpha * value
        return total, per_loss

    def _maybe_gate_fused(self, inputs, targets):
        """One-time fused-kernel dispatch gate (VERDICT r4 next #4):
        recognize kernel-compatible (topology, criteria) combinations
        (models/dispatch.py) and verify the fused objective matches the
        module-graph objective on this batch at the current parameters
        before swapping it in.  Any failure — unrecognized topology,
        shape mismatch, kernel error, parity off — leaves the graph path
        untouched.  Runs before the first step so the jitted step traces
        the chosen objective."""
        if self._fused_gated:
            return
        self._fused_gated = True
        if self.fused == "off" or self.n_loss == 0:
            return
        from flamo_tpu.models.dispatch import recognize_fused

        candidates = recognize_fused(self.net, self.criterion, self.alpha,
                                     self.requires_model)
        if self.fused != "force" and jax.default_backend() == "cpu":
            # interpreter-mode Pallas on CPU is slower than the graph;
            # pure-XLA candidates (cpu_ok) stay eligible
            candidates = [c for c in candidates if c[2]]
        if not candidates:
            return
        ls = self._gather_loss_state()
        step0 = jnp.asarray(self._step_count)

        def graph_total(m, x, t):
            return self._total_loss(m, x, t, step0, ls)[0]

        try:
            g = float(jax.jit(graph_total)(self.net, inputs, targets))
        except Exception:
            return
        for name, loss_fn, _cpu_ok in candidates:
            try:
                f = float(jax.jit(
                    lambda m, x, t: loss_fn(m, x, t, step0, ls)[0])(
                        self.net, inputs, targets))
            except Exception:
                continue
            rel = abs(f - g) / max(1e-9, abs(g))
            if rel < 5e-3:
                self._fused_loss = loss_fn
                self.fused_path = name
                if self.log:
                    print(f"Trainer: fused dispatch -> {name} "
                          f"(parity rel={rel:.1e})")
                return

    def _check_fused_finite(self, losses):
        """Watchdog for the dispatched no-pivot kernels: the recognized
        topologies keep ``||A||_2 <= 1`` by construction (see
        models/dispatch.py), so a non-finite loss on the fused path means
        either an exact closed-loop resonance (the pivoted path would
        produce inf there too) or a model that drifted outside the
        recognized structure — in both cases silently carrying NaNs
        forward is worse than stopping.  Runs only at host sync points
        (per step / per scan chunk), so it costs nothing on device."""
        if self.fused_path is not None and not np.all(np.isfinite(losses)):
            raise RuntimeError(
                f"fused step kernel '{self.fused_path}' produced a "
                "non-finite loss — the training state is corrupted from "
                "this step on. Retrain with Trainer(..., fused='off') to "
                "use the module-graph path (pivoted solve), and please "
                "report the topology: the dispatch gate judged it "
                "structurally stable.")

    def _gather_loss_state(self):
        """Collect stateful-loss arrays (e.g. mask partitions) so they enter
        the jitted step as traced arguments, not baked constants."""
        return tuple(c.mask_indices for c in self.criterion
                     if getattr(c, "stateful", False))

    def _build_step(self, steps_per_epoch: int):
        schedule = optax.exponential_decay(
            init_value=self.lr,
            transition_steps=self.step_size * max(1, steps_per_epoch),
            decay_rate=self.step_factor,
            staircase=True,
        )
        # masked_optimizer: adam state/updates exist only for trainable
        # leaves; frozen leaves (incl. large cached responses) get
        # structural zero updates and their grad chains dead-code away.
        self._tx = masked_optimizer(optax.adam(learning_rate=schedule),
                                    self.net)
        self._mask = trainable_mask(self.net)
        # init on HOST and ship (CLAUDE.md): eager init on a tunneled
        # accelerator pays a round-trip per leaf, and jit-produced state
        # carries non-default layouts that tax every later step
        from flamo_tpu.utils import host_eager, to_device

        if jax.default_backend() == "cpu":
            self._opt_state = self._tx.init(self.net)
        else:
            with host_eager():
                net_h = to_device(self.net, jax.devices("cpu")[0])
                opt_state = self._tx.init(net_h)
            self._opt_state = to_device(opt_state)

        def train_step(model, opt_state, inputs, targets, step, loss_state):
            def loss_fn(m):
                total, per = self._total_loss(m, inputs, targets, step,
                                              loss_state)
                return total, per

            (total, per), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(model)
            updates, opt_state = self._tx.update(grads, opt_state, model)
            model = optax.apply_updates(model, updates)
            return model, opt_state, total, per

        def valid_step(model, inputs, targets, step, loss_state):
            return self._total_loss(model, inputs, targets, step, loss_state)

        self._raw_step = train_step
        self._jitted_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._jitted_valid = jax.jit(valid_step)

    # ------------------------------------------------------------------
    def train(self, train_dataset, valid_dataset, scan: bool = False):
        """Epoch loop (reference trainer.py:103-153).

        ``scan=True`` is the TPU fast path: every epoch is fused into ONE
        dispatched ``lax.scan`` program via :meth:`fit_scan_epochs` —
        numerically the identical step sequence (same step counter, loss
        masks, Adam/schedule state), minus per-step host round-trips.
        Batch order is frozen at stacking time; validation scans ALL
        batches (a second no-grad ``lax.scan``) and per-criterion loss
        logs are populated, so early stopping sees the same signal as
        the eager path."""
        self.train_loss, self.valid_loss = [], []
        self.train_loss_log = {self._loss_name(c): [] for c in self.criterion}
        self.valid_loss_log = {self._loss_name(c): [] for c in self.criterion}

        if scan:
            from flamo_tpu.optimize.dataset import stack_loader

            bx, bt = stack_loader(train_dataset)
            try:
                vx, vt = stack_loader(valid_dataset)
            except (ValueError, StopIteration):  # empty loader
                vx = vt = None
            st = time.time()
            self.fit_scan_epochs(bx, bt, n_epochs=self.max_epochs,
                                 valid_inputs=vx, valid_targets=vt)
            print("Training time: {:.3f}s".format(time.time() - st))
            return

        steps_per_epoch = max(1, len(train_dataset))
        if self._jitted_step is None:
            self._build_step(steps_per_epoch)

        try:
            from tqdm import trange

            epochs = trange(self.max_epochs, desc="Training")
        except ImportError:
            epochs = range(self.max_epochs)

        st = time.time()
        for epoch in epochs:
            st_epoch = time.time()
            profiling = self.profile_dir is not None and epoch == 1
            if profiling:  # epoch 0 compiles; trace the steady state
                jax.profiler.start_trace(self.profile_dir)
            epoch_loss = 0.0
            n_steps = 0
            for inputs, targets in train_dataset:
                epoch_loss += self.train_step((inputs, targets))
                n_steps += 1
            if profiling:
                jax.profiler.stop_trace()
            self.train_loss.append(epoch_loss / max(1, n_steps))
            self._last_steps_per_sec = n_steps / max(1e-9,
                                                     time.time() - st_epoch)

            epoch_loss = 0.0
            n_steps = 0
            for inputs, targets in valid_dataset:
                epoch_loss += self.valid_step((inputs, targets))
                n_steps += 1
            self.valid_loss.append(epoch_loss / max(1, n_steps))
            et_epoch = time.time()

            self.print_results(epoch, et_epoch - st_epoch)
            if self.log:
                self.save_model(epoch)
            if self.early_stop():
                print(f"Early stopping at epoch: {epoch}")
                break
        et = time.time()
        print("Training time: {:.3f}s".format(et - st))

    # ------------------------------------------------------------------
    def fit_scan(self, inputs, targets, n_steps: int, steps_per_call: int = 50):
        """TPU fast path: run ``n_steps`` optimizer steps on a fixed
        (inputs, targets) pair with ``steps_per_call`` steps fused into one
        dispatched ``lax.scan`` program.

        This is exact for the reference's ``Dataset.expand`` training
        semantics (one pair repeated, dataset.py:28-51) and amortizes
        host->device dispatch.  Returns the per-step loss history.

        Runs EXACTLY ``n_steps`` steps: whole ``steps_per_call`` chunks
        reuse one compiled scan length, and any remainder runs as a
        second (smaller, separately cached) scan length — so
        ``n_steps=160, steps_per_call=50`` trains 160 steps (3x50 + 10),
        matching the reference's step-count semantics."""
        import numpy as np

        self._maybe_gate_fused(inputs, targets)
        if self._jitted_step is None:
            self._build_step(1)
        if not hasattr(self, "_scan_cache"):
            self._scan_cache = {}

        def _jmulti(length):
            if length not in self._scan_cache:
                def multi(model, opt_state, inputs, targets, step0,
                          loss_state):
                    def body(carry, i):
                        m, o = carry
                        m, o, total, per = self._raw_step(
                            m, o, inputs, targets, step0 + i, loss_state)
                        return (m, o), total

                    (model, opt_state), losses = jax.lax.scan(
                        body, (model, opt_state), jnp.arange(length))
                    return model, opt_state, losses

                self._scan_cache[length] = jax.jit(
                    multi, donate_argnums=(0, 1))
            return self._scan_cache[length]

        history = []
        done = 0
        while done < n_steps:
            k = min(steps_per_call, n_steps - done)
            self.net, self._opt_state, losses = _jmulti(k)(
                self.net, self._opt_state, inputs, targets,
                jnp.asarray(self._step_count), self._gather_loss_state())
            self._step_count += k
            done += k
            history.append(np.asarray(losses))
            self._check_fused_finite(history[-1])
        return np.concatenate(history) if history else np.zeros(
            0, dtype=np.float32)

    def fit_scan_epochs(self, batched_inputs, batched_targets,
                        n_epochs: int, valid_inputs=None,
                        valid_targets=None):
        """TPU fast path for real multi-batch datasets: one dispatched
        ``lax.scan`` program per epoch, consuming one batch per scan step.

        ``batched_inputs``/``batched_targets`` carry a leading step axis
        ``(S, B, ...)`` — build them with :func:`stack_loader`.  Numerically
        identical to ``S`` sequential :meth:`train_step` calls (same step
        counter, loss masks, Adam/schedule state); amortizes host->device
        dispatch exactly like :meth:`fit_scan` does for the repeated-pair
        case.  Per-criterion train/valid loss logs are populated like the
        eager path's.

        ``valid_inputs``/``valid_targets`` may carry a leading batch-stack
        axis ``(Sv, B, ...)`` (from :func:`stack_loader`) — validation then
        scans ALL batches (a no-grad ``lax.scan``) and early stopping sees
        the same full-validation mean as :meth:`train`; a single batch
        ``(B, ...)`` is treated as a stack of one.  Returns the
        (n_epochs * S,) per-step loss history."""
        import numpy as np

        batched_inputs = jnp.asarray(batched_inputs)
        batched_targets = jnp.asarray(batched_targets)
        S = batched_inputs.shape[0]
        self._maybe_gate_fused(batched_inputs[0], batched_targets[0])
        if self._jitted_step is None:
            self._build_step(S)
        if not hasattr(self, "_scan_epoch_jit"):
            def epoch_fn(model, opt_state, binputs, btargets, step0,
                         loss_state):
                def body(carry, xs):
                    m, o = carry
                    xi, ti, i = xs
                    m, o, total, per = self._raw_step(m, o, xi, ti,
                                                      step0 + i, loss_state)
                    return (m, o), (total, jnp.stack(per))

                (model, opt_state), (losses, per) = jax.lax.scan(
                    body, (model, opt_state),
                    (binputs, btargets,
                     jnp.arange(binputs.shape[0])))
                return model, opt_state, losses, per

            def valid_epoch_fn(model, vinputs, vtargets, step, loss_state):
                def body(carry, xs):
                    xi, ti = xs
                    total, per = self._total_loss(model, xi, ti, step,
                                                  loss_state)
                    return carry, (total, jnp.stack(per))

                _, (totals, per) = jax.lax.scan(
                    body, None, (vinputs, vtargets))
                return jnp.mean(totals), jnp.mean(per, axis=0)

            # jit's own cache re-specializes on new (S, B, ...) shapes
            self._scan_epoch_jit = jax.jit(epoch_fn, donate_argnums=(0, 1))
            self._scan_valid_jit = jax.jit(valid_epoch_fn)

        if valid_inputs is not None:
            valid_inputs = jnp.asarray(valid_inputs)
            valid_targets = jnp.asarray(valid_targets)
            if valid_inputs.ndim == batched_inputs.ndim - 1:
                valid_inputs = valid_inputs[None]
                valid_targets = valid_targets[None]

        history = []
        for epoch in range(n_epochs):
            self.net, self._opt_state, losses, per = self._scan_epoch_jit(
                self.net, self._opt_state, batched_inputs, batched_targets,
                jnp.asarray(self._step_count), self._gather_loss_state())
            self._step_count += S
            history.append(np.asarray(losses))
            self._check_fused_finite(history[-1])
            per = np.asarray(per)  # (S, n_loss)
            for j, criterion in enumerate(self.criterion):
                self.train_loss_log.setdefault(
                    self._loss_name(criterion), []).extend(
                        per[:, j].tolist())
            self.train_loss.append(float(history[-1].mean()))
            if valid_inputs is not None:
                total, vper = self._scan_valid_jit(
                    self.net, valid_inputs, valid_targets,
                    jnp.asarray(self._step_count),
                    self._gather_loss_state())
                self.valid_loss.append(float(total))
                vper = np.asarray(vper)
                for j, criterion in enumerate(self.criterion):
                    self.valid_loss_log.setdefault(
                        self._loss_name(criterion), []).append(
                            float(vper[j]))
            if self.log:
                self.save_model(epoch)
            if valid_inputs is not None and self.early_stop():
                print(f"Early stopping at epoch: {epoch}")
                break
        return np.concatenate(history)

    def train_step(self, data):
        """One optimization step (reference trainer.py:162-192)."""
        inputs, targets = data
        self._maybe_gate_fused(inputs, targets)
        if self._jitted_step is None:
            self._build_step(1)
        for c in self.criterion:
            if hasattr(c, "pre_step"):
                c.pre_step()
        model, opt_state, total, per = self._jitted_step(
            self.net, self._opt_state, inputs, targets,
            jnp.asarray(self._step_count), self._gather_loss_state())
        self.net = model
        self._opt_state = opt_state
        self._step_count += 1
        for criterion, value in zip(self.criterion, per):
            self.train_loss_log.setdefault(
                self._loss_name(criterion), []).append(float(value))
        total = float(total)
        self._check_fused_finite(total)
        return total

    def valid_step(self, data):
        """One validation step (no grad) (reference trainer.py:194-224)."""
        inputs, targets = data
        if self._jitted_valid is None:
            self._build_step(1)
        total, per = self._jitted_valid(
            self.net, inputs, targets, jnp.asarray(self._step_count),
            self._gather_loss_state())
        for criterion, value in zip(self.criterion, per):
            self.valid_loss_log.setdefault(
                self._loss_name(criterion), []).append(float(value))
        return float(total)

    # ------------------------------------------------------------------
    def print_results(self, e: int, e_time: float):
        msg = get_str_results(epoch=e, train_loss=self.train_loss,
                              valid_loss=self.valid_loss, time=e_time)
        sps = getattr(self, "_last_steps_per_sec", None)
        if sps is not None:
            msg += " - {:.1f} steps/s".format(sps)
        print(msg)

    def get_train_dir(self):
        if self.train_dir is not None:
            if not os.path.isdir(self.train_dir):
                os.makedirs(self.train_dir)
        else:
            self.train_dir = os.path.join("output",
                                          time.strftime("%Y%m%d-%H%M%S"))
            os.makedirs(self.train_dir)

    def save_model(self, e: int):
        """Checkpoint the model pytree leaves (reference trainer.py:246-260).

        Format: pickle of numpy leaves — restore with
        :func:`load_model_state` into a structurally identical model."""
        dir_path = os.path.join(self.train_dir, "checkpoints")
        os.makedirs(dir_path, exist_ok=True)
        save_model_state(self.net, os.path.join(dir_path, f"model_e{e}.pkl"))

    def early_stop(self):
        """Early stopping on validation plateau (reference trainer.py:262-277)."""
        if self.valid_loss[-1] < (self.min_val_loss - self.patience_delta):
            self.min_val_loss = self.valid_loss[-1]
            self.counter = 0
        elif ((self.min_val_loss - self.patience_delta) < self.valid_loss[-1]
              and self.valid_loss[-1] < (self.min_val_loss
                                         + self.patience_delta)):
            self.counter += 1
            if self.counter >= self.patience:
                return True
        return False


def _named_leaves(model):
    """OrderedDict of keypath-string -> leaf, plus the treedef."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(model)
    named = {jax.tree_util.keystr(kp): v for kp, v in flat}
    assert len(named) == len(flat), "duplicate leaf key paths"
    keys = [jax.tree_util.keystr(kp) for kp, _ in flat]
    return named, keys, treedef


def _fingerprint(named):
    """Stable hash over (keypath, shape, dtype, bytes) of every leaf —
    pins the model structure AND detects payload corruption, without
    relying on treedef reprs (which may embed unstable object identities
    like closures)."""
    import hashlib

    h = hashlib.sha256()
    for k in sorted(named):
        v = np.ascontiguousarray(np.asarray(named[k]))
        h.update(f"{k}:{v.shape}:{v.dtype}|".encode())
        h.update(v.tobytes())
    return h.hexdigest()


def _check_restorable(named_model, named_ckpt, ckpt_fp, where: str):
    missing = sorted(set(named_model) - set(named_ckpt))
    extra = sorted(set(named_ckpt) - set(named_model))
    if missing or extra:
        raise ValueError(
            f"checkpoint {where} does not match the model structure: "
            f"missing leaves {missing[:5]}{'...' if len(missing) > 5 else ''}, "
            f"unexpected leaves {extra[:5]}{'...' if len(extra) > 5 else ''}"
        )
    for k, v in named_model.items():
        cs, ms = tuple(np.shape(named_ckpt[k])), tuple(np.shape(v))
        if cs != ms:
            raise ValueError(
                f"checkpoint {where}: leaf {k} has shape {cs}, model "
                f"expects {ms}")
    if ckpt_fp is not None and ckpt_fp != _fingerprint(
            {k: np.asarray(v) for k, v in named_ckpt.items()}):
        raise ValueError(f"checkpoint {where} is corrupt "
                         "(fingerprint mismatch)")


def save_model_state(model, path: str):
    """Checkpoint as NAMED leaves (keypath -> array) plus a structure
    fingerprint, so restore assigns by path and fails loudly on any
    mismatch instead of silently misassigning reordered leaves."""
    named, _, _ = _named_leaves(model)
    arrays = {k: np.asarray(v) for k, v in named.items()}
    payload = {"format": 2, "fingerprint": _fingerprint(arrays),
               "leaves": arrays}
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_model_state(model, path: str):
    """Restore a checkpoint into a structurally identical (freshly rebuilt)
    model, matching leaves BY KEY PATH and validating shapes + the saved
    structure fingerprint.  Legacy anonymous-list checkpoints restore
    positionally.  The reference has no resume path at all (SURVEY.md §5);
    this provides one."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    named, keys, treedef = _named_leaves(model)
    if isinstance(payload, list):  # legacy round-1 format
        leaves = [x for x in payload if x is not None]
        if len(leaves) != len(keys):
            raise ValueError(
                f"legacy checkpoint has {len(leaves)} leaves, model has "
                f"{len(keys)}")
        return jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(x) for x in leaves])
    ckpt = payload["leaves"]
    _check_restorable(named, ckpt, payload.get("fingerprint"), path)
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(ckpt[k]) for k in keys])


def save_checkpoint_orbax(model, directory: str, step: int = 0):
    """Orbax checkpoint of the model's NAMED leaves (async-capable,
    sharded-array aware — the option for multi-host runs).  The pickle
    path above remains the default for single-host runs."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    named, _, _ = _named_leaves(model)
    ckptr.save(os.path.join(os.path.abspath(directory), f"step_{step}"),
               {"leaves": dict(named)})
    ckptr.wait_until_finished()


def load_checkpoint_orbax(model, directory: str, step: int = 0):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    named, keys, treedef = _named_leaves(model)
    template = {k: np.asarray(v) for k, v in named.items()}
    restored = ckptr.restore(
        os.path.join(os.path.abspath(directory), f"step_{step}"),
        {"leaves": template})
    ckpt = restored["leaves"]
    _check_restorable(named, ckpt, None, directory)
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(ckpt[k]) for k in keys])


def get_str_results(epoch=None, train_loss=None, valid_loss=None, time=None):
    """Format per-epoch results (reference trainer.py:280-313)."""
    to_print = ""
    if epoch is not None:
        to_print += "epoch: {:3d} ".format(epoch)
    if train_loss is not None:
        to_print += "- train_loss: {:6.4f} ".format(train_loss[-1])
    if valid_loss is not None:
        to_print += "- test_loss: {:6.4f} ".format(valid_loss[-1])
    if time is not None:
        to_print += "- time: {:6.4f} s".format(time)
    return to_print
