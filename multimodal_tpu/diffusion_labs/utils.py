"""Shared diffusion types.

Parity with reference ``diffusion_labs/utils/common.py`` (DiffusionOutput,
denormalize helpers).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DiffusionOutput:
    prediction: jnp.ndarray
    variance_value: Optional[jnp.ndarray] = None
    mean: Optional[jnp.ndarray] = None
    log_variance: Optional[jnp.ndarray] = None


def denormalize_to_0_1(images: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] -> [0, 1] with clipping."""
    return jnp.clip((images + 1.0) / 2.0, 0.0, 1.0)


def normalize_to_neg_1_1(images: jnp.ndarray) -> jnp.ndarray:
    """[0, 1] -> [-1, 1]."""
    return images * 2.0 - 1.0
