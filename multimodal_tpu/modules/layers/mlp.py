"""MLP.

Parity with reference ``modules/layers/mlp.py:13`` — linear stack with
optional per-hidden-layer normalization and dropout.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.activation import get_activation


class MLP(nn.Module):
    """in_dim -> hidden_dims* -> out_dim with activation/dropout/norm per hidden layer."""

    in_dim: int
    out_dim: int
    hidden_dims: Optional[Union[int, Sequence[int]]] = None
    dropout: float = 0.5
    activation: Union[str, Callable] = "relu"
    normalization: Optional[Callable[..., nn.Module]] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        hidden_dims = self.hidden_dims
        if hidden_dims is None:
            hidden_dims = []
        if isinstance(hidden_dims, int):
            hidden_dims = [hidden_dims]
        act = get_activation(self.activation)
        for i, h in enumerate(hidden_dims):
            x = nn.Dense(h, dtype=self.dtype, param_dtype=self.param_dtype, name=f"hidden_{i}")(x)
            if self.normalization is not None:
                x = self.normalization(name=f"norm_{i}")(x)
            x = act(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="out")(x)
