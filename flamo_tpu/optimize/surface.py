"""Loss-landscape diagnostics (counterpart of reference
flamo/optimize/surface.py): 1-D loss profiles and 2-D loss surfaces over raw
parameters, with optional perturbation runs.

Pydantic-configured like the reference; scans run the jitted model forward
host-side over the step grid, save ``.mat`` artifacts via scipy.io and plot
with matplotlib (Agg-safe).
"""

from __future__ import annotations

import math
import os
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel, ConfigDict

from flamo_tpu.utils import next_key


class ParameterConfig(BaseModel):
    """One scanned parameter (reference surface.py:14-26)."""

    key: Optional[str] = None
    param_map: Callable = lambda x: x
    lower_bound: Optional[float | List[float] | List[List[float]]] = None
    upper_bound: Optional[float | List[float] | List[List[float]]] = None
    target_value: Optional[float] = None
    scale: str = "linear"
    n_steps: Optional[int] = None
    indx: object = None

    model_config = ConfigDict(arbitrary_types_allowed=True)


class LossConfig(BaseModel):
    """Scan configuration (reference surface.py:29-37)."""

    criteria: Optional[List[Callable]] = None
    param_config: Optional[List[ParameterConfig]] = None
    perturb_param: Optional[str] = None
    perturb_map: Callable = lambda x: x
    n_runs: Optional[int] = None
    output_dir: Optional[str] = None

    model_config = ConfigDict(arbitrary_types_allowed=True)


def _get_nested_module(core, key: str):
    module = core
    for k in key.split("."):
        module = getattr(module, k)
    return module


def _set_nested_module(core, key: str, new_module):
    """Functionally replace the module at dotted ``key`` inside a tree of
    Series/Recursion containers."""
    from flamo_tpu.processor.system import Parallel, Recursion, Series

    keys = key.split(".")
    head, rest = keys[0], ".".join(keys[1:])
    if isinstance(core, Series):
        new_modules = []
        for k, m in zip(core.keys, core.modules):
            if k == head:
                m = _set_nested_module(m, rest, new_module) if rest \
                    else new_module
            new_modules.append(m)
        return core.replace(modules=tuple(new_modules))
    if isinstance(core, Recursion):
        if head in ("feedforward", "feedback"):
            child = getattr(core, head)
            child = _set_nested_module(child, rest, new_module) if rest \
                else new_module
            return core.replace(**{head: child})
    if isinstance(core, Parallel):
        if head in ("branchA", "branchB"):
            child = getattr(core, head)
            child = _set_nested_module(child, rest, new_module) if rest \
                else new_module
            return core.replace(**{head: child})
    raise KeyError(f"cannot resolve module key {key!r} in {type(core)}")


class LossProfile:
    """1-D loss profile over one raw parameter (reference surface.py:40-325)."""

    def __init__(self, net, loss_config: LossConfig, dtype=jnp.float32):
        self.net = net
        self.loss_config = loss_config
        self.param_config = loss_config.param_config[0]
        self.criteria = loss_config.criteria
        self.n_runs = loss_config.n_runs
        self.output_dir = loss_config.output_dir
        self.dtype = dtype
        self.register_steps()

    # -- parameter plumbing ------------------------------------------------
    def get_modules_keys(self, module, prefix=""):
        from flamo_tpu.processor.system import Parallel, Recursion, Series

        keys = []
        if isinstance(module, Series):
            for k, m in zip(module.keys, module.modules):
                full = f"{prefix}.{k}" if prefix else k
                keys.append(full)
                keys.extend(self.get_modules_keys(m, full))
        elif isinstance(module, Recursion):
            for k in ("feedforward", "feedback"):
                full = f"{prefix}.{k}" if prefix else k
                keys.append(full)
                keys.extend(self.get_modules_keys(getattr(module, k), full))
        elif isinstance(module, Parallel):
            for k in ("branchA", "branchB"):
                full = f"{prefix}.{k}" if prefix else k
                keys.append(full)
                keys.extend(self.get_modules_keys(getattr(module, k), full))
        return keys

    def get_nested_module(self, core, key):
        return _get_nested_module(core, key)

    def set_raw_parameter(self, param_key: str, new_value, map=lambda x: x,
                          indx=None):
        core = self.net.get_core()
        module = _get_nested_module(core, param_key)
        module = module.assign_value(jnp.asarray(map(new_value),
                                                 dtype=self.dtype), indx)
        core = _set_nested_module(core, param_key, module)
        self.net = self.net.set_core(core)

    def sample_rand_param(self, ref_param, key=None):
        std = jnp.std(ref_param)
        mean = jnp.mean(ref_param)
        return jax.random.normal(next_key(key), ref_param.shape,
                                 dtype=ref_param.dtype) * std + mean

    # -- scanning ----------------------------------------------------------
    def get_steps(self, lower, upper, n_steps, scale):
        if isinstance(lower, list):
            lo, hi = 0.0, 1.0
        else:
            lo, hi = lower, upper
        if scale == "linear":
            return jnp.linspace(lo, hi, n_steps, dtype=self.dtype)
        if scale == "log":
            return jnp.logspace(math.log10(lo), math.log10(hi), n_steps,
                                dtype=self.dtype)
        raise ValueError("Scale must be either 'linear' or 'log'")

    def register_steps(self):
        self.steps = self.get_steps(
            self.param_config.lower_bound, self.param_config.upper_bound,
            self.param_config.n_steps, self.param_config.scale)

    def compute_loss(self, input, target):
        fwd = jax.jit(lambda net, x: net(x))
        steps = np.asarray(self.steps)
        loss = np.empty((self.n_runs, len(steps), len(self.criteria)))
        pc = self.param_config
        for i_run in range(self.n_runs):
            if self.loss_config.perturb_param:
                ref = _get_nested_module(
                    self.net.get_core(), self.loss_config.perturb_param).param
                self.set_raw_parameter(self.loss_config.perturb_param,
                                       self.sample_rand_param(ref),
                                       self.loss_config.perturb_map)
            for i_step, s in enumerate(steps):
                if isinstance(pc.lower_bound, list):
                    new_value = ((1 - s) * jnp.asarray(pc.lower_bound)
                                 + s * jnp.asarray(pc.upper_bound))
                else:
                    new_value = jnp.asarray(s)
                self.set_raw_parameter(pc.key, new_value, pc.param_map,
                                       pc.indx)
                pred = fwd(self.net, input)
                for i_crit, crit in enumerate(self.criteria):
                    loss[i_run, i_step, i_crit] = float(crit(pred, target))
            if self.output_dir:
                from scipy.io import savemat

                savemat(
                    f"{self.output_dir}/partial_loss_run_{i_run + 1}.mat",
                    {"loss": loss[i_run], "steps": steps})
        return loss

    def plot_loss(self, loss: np.ndarray):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        steps = np.asarray(self.steps)
        n_crit = len(self.criteria)
        fig, axes = plt.subplots(1, n_crit, figsize=(6 * n_crit, 5),
                                 squeeze=False)
        for i_crit in range(n_crit):
            ax = axes[0][i_crit]
            mean_loss = loss[:, :, i_crit].mean(0)
            std_loss = loss[:, :, i_crit].std(0)
            name = getattr(self.criteria[i_crit], "name",
                           type(self.criteria[i_crit]).__name__)
            ax.plot(steps, mean_loss, label=name)
            ax.plot(steps[mean_loss.argmin()], mean_loss.min(), marker="x",
                    label="Min Loss")
            ax.set_xscale(self.param_config.scale)
            ax.fill_between(steps, mean_loss - std_loss,
                            mean_loss + std_loss, alpha=0.2)
            if self.param_config.target_value is not None:
                ax.axvline(x=self.param_config.target_value, color="r",
                           linestyle="--", label="Target Value")
            ax.set_xlabel(self.param_config.key)
            ax.set_ylabel("Loss")
            ax.legend()
            ax.set_title(name)
        fig.tight_layout()
        if self.output_dir:
            fig.savefig(f"{self.output_dir}/{self.param_config.key}.png")
        return fig, axes

    def compute_accuracy(self, loss):
        """Accuracy per Turian & Henry, arXiv:2012.04572
        (reference surface.py:292-311)."""
        steps = np.asarray(self.steps)
        target_indx = np.abs(steps - self.param_config.target_value).argmin()
        accuracy = (loss > loss[:, target_indx:target_indx + 1, :]).astype(
            float)
        return accuracy.mean(axis=0)


class LossSurface(LossProfile):
    """2-D loss surface over two raw parameters (reference surface.py:326-655)."""

    def __init__(self, net, loss_config: LossConfig, dtype=jnp.float32):
        super().__init__(net, loss_config, dtype)
        assert len(loss_config.param_config) == 2, (
            "LossSurface supports only two optimizable parameters."
        )
        self.param_config = loss_config.param_config

    def register_steps(self):
        pcs = self.loss_config.param_config
        self.steps_0 = self.get_steps(pcs[0].lower_bound, pcs[0].upper_bound,
                                      pcs[0].n_steps, pcs[0].scale)
        self.steps_1 = self.get_steps(pcs[1].lower_bound, pcs[1].upper_bound,
                                      pcs[1].n_steps, pcs[1].scale)

    def compute_loss(self, input, target):
        fwd = jax.jit(lambda net, x: net(x))
        s0 = np.asarray(self.steps_0)
        s1 = np.asarray(self.steps_1)
        pc0, pc1 = self.param_config
        loss = np.empty((self.n_runs, len(s0), len(s1), len(self.criteria)))
        for i_run in range(self.n_runs):
            if self.loss_config.perturb_param:
                ref = _get_nested_module(
                    self.net.get_core(), self.loss_config.perturb_param).param
                self.set_raw_parameter(self.loss_config.perturb_param,
                                       self.sample_rand_param(ref),
                                       self.loss_config.perturb_map)
            for i0, v0 in enumerate(s0):
                self.set_raw_parameter(pc0.key, jnp.asarray(v0),
                                       pc0.param_map, pc0.indx)
                for i1, v1 in enumerate(s1):
                    self.set_raw_parameter(pc1.key, jnp.asarray(v1),
                                           pc1.param_map, pc1.indx)
                    pred = fwd(self.net, input)
                    for i_crit, crit in enumerate(self.criteria):
                        loss[i_run, i0, i1, i_crit] = float(
                            crit(pred, target))
            if self.output_dir:
                from scipy.io import savemat

                savemat(f"{self.output_dir}/surface_run_{i_run + 1}.mat",
                        {"loss": loss[i_run], "steps_0": s0, "steps_1": s1})
        return loss

    def compute_accuracy(self, loss):
        """2-D accuracy per Turian & Henry, arXiv:2012.04572 (reference
        surface.py:631-655): fraction of runs where each grid point's loss
        exceeds the loss at the (target_0, target_1) grid point.  Returns
        (n_steps_0, n_steps_1, n_criteria)."""
        s0 = np.asarray(self.steps_0)
        s1 = np.asarray(self.steps_1)
        pc0, pc1 = self.param_config
        t0 = np.abs(s0 - pc0.target_value).argmin()
        t1 = np.abs(s1 - pc1.target_value).argmin()
        ref = loss[:, t0:t0 + 1, t1:t1 + 1, :]
        return (loss > ref).astype(float).mean(axis=0)

    def plot_loss(self, loss: np.ndarray):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib import cm

        s0 = np.asarray(self.steps_0)
        s1 = np.asarray(self.steps_1)
        n_crit = len(self.criteria)
        fig = plt.figure(figsize=(6 * n_crit, 5))
        for i_crit in range(n_crit):
            ax = fig.add_subplot(1, n_crit, i_crit + 1, projection="3d")
            X, Y = np.meshgrid(s0, s1, indexing="ij")
            Z = loss[:, :, :, i_crit].mean(0)
            ax.plot_surface(X, Y, Z, cmap=cm.coolwarm)
            ax.set_xlabel(self.param_config[0].key)
            ax.set_ylabel(self.param_config[1].key)
            name = getattr(self.criteria[i_crit], "name",
                           type(self.criteria[i_crit]).__name__)
            ax.set_title(name)
        fig.tight_layout()
        if self.output_dir:
            fig.savefig(f"{self.output_dir}/loss_surface.png")
        return fig
