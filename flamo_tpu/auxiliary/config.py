"""Pydantic configuration models (counterpart of reference
flamo/auxiliary/config/config.py)."""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel, ConfigDict, field_validator


class HomogeneousFDNConfig(BaseModel):
    """Configuration for :class:`flamo_tpu.auxiliary.reverb.HomogeneousFDN`
    (reference config.py:10-81).  ``extra='forbid'`` to catch config typos."""

    N: int = 6
    alias_decay_db: int = 0
    rt60: Optional[float] = None
    sample_rate: int = 48000
    nfft: int = 96000
    device: str = "tpu"
    dtype: str = "float32"
    delays: Optional[List[int]] = None
    delay_range_ms: List[float] = [20.0, 50.0]
    input_gain_grad: bool = True
    output_gain_grad: bool = True
    delays_grad: bool = False
    mixing_matrix_grad: bool = True
    attenuation_grad: bool = True
    is_delay_int: bool = True
    solve_method: str = "ge"  # 'ge' | 'ge_nopivot' | 'pallas' | 'lu'

    def __init__(self, **data):
        super().__init__(**data)
        if self.delays is None:
            self.delay_length_samps()

    def delay_length_samps(self) -> List[int]:
        """Coprime delay-line lengths for the given range
        (reference config.py:45-57)."""
        from flamo_tpu.auxiliary.reverb import coprime_delay_lengths

        self.delays = coprime_delay_lengths(self.N, self.delay_range_ms,
                                            self.sample_rate)
        return self.delays

    @field_validator("delays", mode="after")
    @classmethod
    def check_delays_length(cls, v, values):
        if v is not None:
            if len(v) != values.data["N"]:
                raise ValueError(
                    f"Length of delays ({len(v)}) must match N "
                    f"({values.data['N']})"
                )
        return v

    @field_validator("device", mode="after")
    @classmethod
    def validate_training_device(cls, value):
        """Validate accelerator availability when requested."""
        if value == "tpu":
            try:
                platforms = {d.platform for d in jax.devices()}
            except RuntimeError:
                platforms = set()
            if not platforms - {"cpu"}:
                # fall back silently — bin math runs anywhere
                return "cpu"
        return value

    @field_validator("dtype", mode="before")
    @classmethod
    def normalize_dtype(cls, value):
        return str(jnp.dtype(value))

    model_config = ConfigDict(extra="forbid", arbitrary_types_allowed=True)
