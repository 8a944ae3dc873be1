"""Composable Vision Transformer encoder.

Parity with reference ``modules/encoders/vision_transformer.py``
(VisionTransformer:19, GlobalAveragePooler:89, vision_transformer:131,
vit_b_16..vit_h_14:206-265). Images are NHWC.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.patch_embedding import PatchEmbeddings
from multimodal_tpu.modules.layers.transformer import (
    TransformerEncoder,
    TransformerOutput,
)


class VisionTransformer(nn.Module):
    """embeddings -> encoder -> optional pooler, returning TransformerOutput."""

    embeddings: nn.Module
    encoder: nn.Module
    pooler: Optional[nn.Module] = None

    def __call__(
        self,
        images: jnp.ndarray,
        image_patches_mask: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> TransformerOutput:
        embedding_output = self.embeddings(
            images, image_patches_mask=image_patches_mask, deterministic=deterministic
        ).embeddings
        encoder_output = self.encoder(
            embedding_output,
            attention_mask=attention_mask,
            return_hidden_states=True,
            deterministic=deterministic,
        )
        last_hidden_state = encoder_output.last_hidden_state
        pooled = self.pooler(last_hidden_state) if self.pooler is not None else None
        return TransformerOutput(
            last_hidden_state=last_hidden_state,
            pooler_output=pooled,
            hidden_states=encoder_output.hidden_states,
            attentions=encoder_output.attentions,
        )


class GlobalAveragePooler(nn.Module):
    """Mean over non-CLS tokens + LN + optional linear head."""

    input_dim: int
    output_dim: Optional[int] = None
    ln_eps: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = jnp.mean(x[:, 1:, :], axis=1)
        out = nn.LayerNorm(
            epsilon=self.ln_eps, dtype=jnp.float32, param_dtype=self.param_dtype,
            name="norm",
        )(out.astype(jnp.float32)).astype(x.dtype)
        if self.output_dim:
            out = nn.Dense(
                self.output_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                name="head",
            )(out)
        return out


def vision_transformer(
    *,
    patch_size: int,
    hidden_dim: int,
    dim_feedforward: int,
    n_layer: int,
    n_head: int,
    image_size: Union[int, Tuple[int, int]] = 224,
    num_channels: int = 3,
    activation: Union[str, Callable] = "gelu",
    transformer_dropout: float = 0.0,
    patch_embed_dropout_prob: float = 0.0,
    layer_norm_eps: float = 1e-6,
    final_layer_norm_eps: Optional[float] = 1e-6,
    norm_first: bool = True,
    include_cls_embed: bool = True,
    drop_path_rate: Optional[float] = None,
    patch_drop_rate: Optional[Union[float, Tuple[float, float]]] = None,
    pooler: Optional[nn.Module] = None,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
    remat: bool = False,
) -> VisionTransformer:
    image_embedding = PatchEmbeddings(
        image_size=image_size,
        patch_size=patch_size,
        hidden_size=hidden_dim,
        hidden_dropout_prob=patch_embed_dropout_prob,
        patch_drop_rate=patch_drop_rate,
        num_channels=num_channels,
        include_cls_embed=include_cls_embed,
        dtype=dtype,
        param_dtype=param_dtype,
    )
    transformer_encoder = TransformerEncoder(
        n_layer=n_layer,
        d_model=hidden_dim,
        n_head=n_head,
        dim_feedforward=dim_feedforward,
        dropout=transformer_dropout,
        activation=activation,
        layer_norm_eps=layer_norm_eps,
        norm_first=norm_first,
        final_layer_norm_eps=final_layer_norm_eps,
        drop_path_rate=drop_path_rate,
        dtype=dtype,
        param_dtype=param_dtype,
        remat=remat,
    )
    return VisionTransformer(
        embeddings=image_embedding, encoder=transformer_encoder, pooler=pooler
    )


def vit_b_16(pooler: Optional[nn.Module] = None, **kwargs: Any) -> VisionTransformer:
    return vision_transformer(
        patch_size=16, n_layer=12, n_head=12, hidden_dim=768,
        dim_feedforward=3072, pooler=pooler, **kwargs,
    )


def vit_b_32(pooler: Optional[nn.Module] = None, **kwargs: Any) -> VisionTransformer:
    return vision_transformer(
        patch_size=32, n_layer=12, n_head=12, hidden_dim=768,
        dim_feedforward=3072, pooler=pooler, **kwargs,
    )


def vit_l_16(pooler: Optional[nn.Module] = None, **kwargs: Any) -> VisionTransformer:
    return vision_transformer(
        patch_size=16, n_layer=24, n_head=16, hidden_dim=1024,
        dim_feedforward=4096, pooler=pooler, **kwargs,
    )


def vit_l_32(pooler: Optional[nn.Module] = None, **kwargs: Any) -> VisionTransformer:
    return vision_transformer(
        patch_size=32, n_layer=24, n_head=16, hidden_dim=1024,
        dim_feedforward=4096, pooler=pooler, **kwargs,
    )


def vit_h_14(pooler: Optional[nn.Module] = None, **kwargs: Any) -> VisionTransformer:
    return vision_transformer(
        patch_size=14, n_layer=32, n_head=16, hidden_dim=1280,
        dim_feedforward=5120, pooler=pooler, **kwargs,
    )
