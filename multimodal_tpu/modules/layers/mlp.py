"""MLP.

Parity with reference ``modules/layers/mlp.py:13`` — linear stack with
optional per-hidden-layer normalization and dropout.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.activation import get_activation
from multimodal_tpu.modules.layers.dense_params import (
    DenseParams,
    dense_apply,
    dense_interception_active,
)
from multimodal_tpu.ops.fused_encoder import (
    FUSED_ACT_FOR,
    fused_mlp,
    fused_mlp_available,
)


class MLP(nn.Module):
    """in_dim -> hidden_dims* -> out_dim with activation/dropout/norm per hidden layer.

    The single-hidden, no-normalization case — every transformer block's
    feed-forward — routes through the Pallas ``fused_mlp`` kernel on TPU
    (d_ff intermediate VMEM-only, weights grid-resident; see
    ``ops/fused_encoder``) whenever dropout is inactive. The parameter tree
    (``hidden_0``/``out`` with ``kernel``/``bias``) is identical on both
    paths, so checkpoints, converters, and sharding rules are unaffected.
    """

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

        if (
            len(hidden_dims) == 1
            and self.normalization is None
            and x.shape[-1] == self.in_dim
            # interceptor hooks (multi-LoRA serving) need the nn.Dense
            # module path below — same param names, every matmul visible
            and not dense_interception_active()
        ):
            h = hidden_dims[0]
            w1, b1 = DenseParams(
                h, param_dtype=self.param_dtype, name="hidden_0"
            )(self.in_dim)
            w2, b2 = DenseParams(
                self.out_dim, param_dtype=self.param_dtype, name="out"
            )(h)
            fused_act = (
                FUSED_ACT_FOR.get(self.activation)
                if isinstance(self.activation, str)
                else None
            )
            dropout_active = self.dropout > 0 and not deterministic
            if (
                fused_act is not None
                and not dropout_active
                and x.shape[-1] == self.in_dim
                and fused_mlp_available(self.in_dim, h, self.out_dim)
            ):
                return fused_mlp(
                    x.astype(self.dtype), w1.astype(self.dtype),
                    b1.astype(self.dtype), w2.astype(self.dtype),
                    b2.astype(self.dtype), fused_act,
                )
            y = act(dense_apply(x, w1, b1, self.dtype))
            if self.dropout > 0:
                y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
            return dense_apply(y, w2, b2, self.dtype)

        for i, h in enumerate(hidden_dims):
            x = nn.Dense(h, dtype=self.dtype, param_dtype=self.param_dtype, name=f"hidden_{i}")(x)
            if self.normalization is not None:
                x = self.normalization(name=f"norm_{i}")(x)
            x = act(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="out")(x)
