"""flamo_tpu — a TPU-native JAX framework for frequency-domain differentiable audio processing.

Re-designed from scratch for TPU (jax / XLA / pallas / pjit) with the full
capability surface of the reference library `gdalsanto/flamo` (PyTorch, CPU/GPU):
every processor is an LTI system sampled on the rfft grid (``nfft//2+1`` bins);
filtering is complex per-bin contraction; closed loops are solved per bin as
``(I - G H)^{-1}``; gradient descent optimizes raw parameters through
differentiable parameter -> coefficient -> frequency-response maps.

Design (TPU-first, not a port):
  * modules are immutable pytrees (see :mod:`flamo_tpu.core`); forwards are pure
    functions -> a whole model jits into ONE XLA program,
  * the frequency-bin axis M (~48001 at nfft=96000) is embarrassingly parallel:
    it vectorizes on the VPU within a chip and shards over a ``jax.sharding.Mesh``
    across chips with zero forward collectives (:mod:`flamo_tpu.parallel`),
  * the closed-loop per-bin solve uses an unrolled, vectorized Gaussian
    elimination tuned for small channel counts (:mod:`flamo_tpu.ops`),
  * the reference's mutable idioms (``assign_value``, Shell layer swapping,
    hyper-conditioning write-back) become functional equivalents.

Reference layer map: /root/reference (see SURVEY.md for file:line citations).
"""

from flamo_tpu import core, functional, utils
from flamo_tpu.processor import dsp, system  # noqa: F401 — also usable as
# `from flamo_tpu import dsp, system` like the reference's root exports
from flamo_tpu import optimize
from flamo_tpu import auxiliary
from flamo_tpu import parallel
from flamo_tpu import ops

# convenience re-exports mirroring the reference's `from flamo import ...` surface
from flamo_tpu.functional import *  # noqa: F401,F403
from flamo_tpu.utils import (
    set_seed, next_key, to_complex, save_audio, get_device, host_eager,
    enable_x64,
)
from flamo_tpu import models

__version__ = "0.1.0"
