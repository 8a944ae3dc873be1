"""Deepset fusion: stack -> (attention) -> normalize -> pool -> MLP.

Parity with reference ``modules/fusions/deepset_fusion.py``
(DeepsetFusionModule:14, DeepsetFusionWithTransformer:141,
deepset_transformer:171).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.transformer import TransformerEncoder


def get_projection_dim(channel_to_encoder_dim: Dict[str, int], use_auto_mapping: bool) -> int:
    if use_auto_mapping:
        return min(channel_to_encoder_dim.values())
    dims = set(channel_to_encoder_dim.values())
    if len(dims) != 1:
        raise ValueError(
            "Encoder dimension should be same for all channels if use_auto_mapping is False"
        )
    return dims.pop()


class DeepsetFusionModule(nn.Module):
    channel_to_encoder_dim: Dict[str, int]
    mlp: nn.Module
    pooling_function: Callable = jnp.sum  # called as f(x, axis=1)
    apply_attention: bool = False
    attention_dim: Optional[int] = None
    modality_normalize: bool = False
    norm_factor: float = 2.0
    use_auto_mapping: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def _pool(self, x: jnp.ndarray) -> jnp.ndarray:
        pooled = self.pooling_function(x, axis=1)
        if isinstance(pooled, tuple):
            pooled = pooled[0]
        return pooled

    @nn.compact
    def __call__(self, embeddings: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        channels = sorted(self.channel_to_encoder_dim.keys())
        proj_dim = get_projection_dim(self.channel_to_encoder_dim, self.use_auto_mapping)

        projected = []
        for ch in channels:
            e = embeddings[ch]
            if self.use_auto_mapping:
                e = nn.Dense(
                    proj_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"projection_{ch}",
                )(e)
            projected.append(e)

        stacked = jnp.stack(projected, axis=1)  # (b, channels, proj_dim)

        if self.apply_attention:
            attn_dim = self.attention_dim or proj_dim // 2
            a = nn.Dense(attn_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="attention_hidden")(stacked)
            a = jnp.tanh(a)
            a = nn.Dense(1, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="attention_out")(a)
            stacked = stacked * jax.nn.softmax(a, axis=-2)

        axis = 1 if self.modality_normalize else 2
        norm = jnp.sum(jnp.abs(stacked) ** self.norm_factor, axis=axis, keepdims=True) ** (
            1.0 / self.norm_factor
        )
        normalized = stacked / jnp.maximum(norm, 1e-12)

        pooled = self._pool(normalized)
        return self.mlp(pooled)


class DeepsetFusionWithTransformer(DeepsetFusionModule):
    """Pooling via a transformer encoder; first token is the pooled feature."""

    def _pool(self, x: jnp.ndarray) -> jnp.ndarray:
        out = self.pooling_function(x)
        if hasattr(out, "last_hidden_state"):
            out = out.last_hidden_state
        return out[:, 0, :]


def deepset_transformer(
    channel_to_encoder_dim: Dict[str, int],
    mlp: nn.Module,
    apply_attention: bool = False,
    attention_dim: Optional[int] = None,
    modality_normalize: bool = False,
    norm_factor: float = 2.0,
    use_auto_mapping: bool = False,
    num_transformer_att_heads: int = 8,
    num_transformer_layers: int = 1,
) -> DeepsetFusionWithTransformer:
    proj_dim = get_projection_dim(channel_to_encoder_dim, use_auto_mapping)
    if proj_dim % num_transformer_att_heads != 0:
        raise ValueError(
            f"projection dim should be divisible by attention heads, "
            f"found {proj_dim} and {num_transformer_att_heads}"
        )
    transformer = TransformerEncoder(
        n_layer=num_transformer_layers,
        d_model=proj_dim,
        n_head=num_transformer_att_heads,
        dim_feedforward=2048,
        final_layer_norm_eps=1e-5,
    )
    return DeepsetFusionWithTransformer(
        channel_to_encoder_dim,
        mlp,
        transformer,
        apply_attention,
        attention_dim,
        modality_normalize,
        norm_factor,
        use_auto_mapping,
    )
