"""Activations.

Parity with reference ``modules/layers/activation.py`` (SiLU:12 — CLIP's
"quick gelu" ``x * sigmoid(1.702 x)`` — and GEGLU:28), as pure functions and
a Flax GEGLU module.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's SiLU variant: ``x * sigmoid(1.702 * x)`` (≈ GELU)."""
    return x * jax.nn.sigmoid(1.702 * x)


# Alias matching the reference class name (reference activation.py:12 calls
# this SiLU even though it is the 1.702-scaled variant).
silu_1702 = quick_gelu


class GEGLU(nn.Module):
    """Gated GELU: project to 2x width, gate half with GELU of the other half.

    Parity: reference ``modules/layers/activation.py:28``.
    """

    dim_out: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        projected = nn.Dense(self.dim_out * 2, dtype=self.dtype, param_dtype=self.param_dtype, name="proj")(x)
        x_out, gate = jnp.split(projected, 2, axis=-1)
        return x_out * jax.nn.gelu(gate, approximate=False)


ACT2FN = {
    "relu": jax.nn.relu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "quick_gelu": quick_gelu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}


def get_activation(name_or_fn):
    if callable(name_or_fn):
        return name_or_fn
    try:
        return ACT2FN[name_or_fn]
    except KeyError:
        raise ValueError(f"unknown activation {name_or_fn!r}; known: {sorted(ACT2FN)}")
