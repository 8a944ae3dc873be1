"""FLAVA image encoder (ViT with BEiT-style mask tokens).

Parity with reference ``models/flava/image_encoder.py`` (PatchEmbeddings:29,
ImageEmbeddings:68, ImageTransformer:179, flava_image_encoder:237,
ImageTransformerWithVAE:281). NHWC layout; position-embedding interpolation
for off-config resolutions uses ``jax.image.resize`` (bicubic) with static
shapes.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.normalizations import Fp32LayerNorm
from multimodal_tpu.modules.layers.transformer import (
    TransformerEncoder,
    TransformerOutput,
)
from multimodal_tpu.modules.losses.flava import Pooler


class ImageEmbeddings(nn.Module):
    """CLS + conv patchify + learned position embeddings + mask token."""

    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    hidden_dropout_prob: float = 0.0
    use_image_masking: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        pixel_values: jnp.ndarray,
        image_patches_mask: Optional[jnp.ndarray] = None,
        interpolate_pos_encoding: bool = False,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, h, w, _ = pixel_values.shape
        if not interpolate_pos_encoding and (h != self.image_size or w != self.image_size):
            raise ValueError(
                f"Input image size ({h}*{w}) doesn't match model ({self.image_size})."
            )
        patches = nn.Conv(
            self.hidden_size,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="patch_projection",
        )(pixel_values.astype(self.dtype))
        n_h, n_w = h // self.patch_size, w // self.patch_size
        embeddings = patches.reshape(b, n_h * n_w, self.hidden_size)

        num_patches = (self.image_size // self.patch_size) ** 2
        position_embeddings = self.param(
            "position_embeddings", nn.initializers.zeros,
            (1, num_patches + 1, self.hidden_size), self.param_dtype,
        )
        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.hidden_size), self.param_dtype
        )

        if image_patches_mask is not None and self.use_image_masking:
            mask_token = self.param(
                "mask_token", nn.initializers.zeros, (1, 1, self.hidden_size),
                self.param_dtype,
            )
            # mask arrives flat (b, n) or as the transform's (b, gh, gw) grid
            m = image_patches_mask.reshape(b, -1)[..., None].astype(embeddings.dtype)
            embeddings = embeddings * (1 - m) + mask_token.astype(embeddings.dtype) * m

        cls = jnp.broadcast_to(
            cls_token.astype(embeddings.dtype), (b, 1, self.hidden_size)
        )
        embeddings = jnp.concatenate([cls, embeddings], axis=1)

        if interpolate_pos_encoding and embeddings.shape[1] != num_patches + 1:
            pos = self._interpolate(position_embeddings, n_h, n_w)
        else:
            pos = position_embeddings
        embeddings = embeddings + pos.astype(embeddings.dtype)
        return nn.Dropout(self.hidden_dropout_prob, deterministic=deterministic)(embeddings)

    def _interpolate(self, position_embeddings, n_h: int, n_w: int):
        """Bicubic-resample patch position embeddings to a new grid (DINO-style,
        reference image_encoder.py:102-137)."""
        cls_pos = position_embeddings[:, :1]
        patch_pos = position_embeddings[:, 1:]
        n = patch_pos.shape[1]
        side = int(math.sqrt(n))
        grid = patch_pos.reshape(1, side, side, self.hidden_size)
        resized = jax.image.resize(
            grid, (1, n_h, n_w, self.hidden_size), method="cubic"
        )
        return jnp.concatenate(
            [cls_pos, resized.reshape(1, n_h * n_w, self.hidden_size)], axis=1
        )


class ImageTransformer(nn.Module):
    """embeddings -> encoder -> final LN -> pooler (reference :179)."""

    embeddings: nn.Module
    encoder: nn.Module
    layernorm: nn.Module
    pooler: Optional[nn.Module] = None

    def __call__(
        self,
        pixel_values: jnp.ndarray,
        image_patches_mask: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> TransformerOutput:
        embedding_output = self.embeddings(
            pixel_values, image_patches_mask=image_patches_mask,
            deterministic=deterministic,
        )
        # scan-layout encoders have no per-layer taps; synthesize the one
        # tap FLAVA consumes (hidden_states[-1] = pre-final-LN last hidden).
        scanned = getattr(self.encoder, "scan_layers", False)
        encoder_output = self.encoder(
            embedding_output,
            attention_mask=attention_mask,
            return_hidden_states=not scanned,
            return_attn_weights=not scanned,
            deterministic=deterministic,
        )
        hidden_states = encoder_output.hidden_states
        if scanned:
            hidden_states = (encoder_output.last_hidden_state,)
        sequence_output = self.layernorm(encoder_output.last_hidden_state)
        pooled = self.pooler(sequence_output) if self.pooler is not None else None
        return TransformerOutput(
            last_hidden_state=sequence_output,
            pooler_output=pooled,
            hidden_states=hidden_states,
            attentions=encoder_output.attentions,
        )


def flava_image_encoder(
    hidden_size: int = 768,
    num_attention_heads: int = 12,
    num_hidden_layers: int = 12,
    use_image_masking: bool = False,
    dropout: float = 0.0,
    intermediate_size: int = 3072,
    intermediate_activation: Union[str, Callable] = "gelu",
    layer_norm_eps: float = 1e-12,
    image_size: int = 224,
    patch_size: int = 16,
    num_channels: int = 3,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
    remat: bool = False,
    scan_layers: bool = False,
    moe_num_experts: Optional[int] = None,
    moe_top_k: int = 2,
    moe_capacity_factor: float = 1.25,
    moe_interval: int = 2,
    ep_axis_name: Optional[str] = None,
) -> ImageTransformer:
    embeddings = ImageEmbeddings(
        image_size=image_size,
        patch_size=patch_size,
        num_channels=num_channels,
        hidden_size=hidden_size,
        hidden_dropout_prob=dropout,
        use_image_masking=use_image_masking,
        dtype=dtype,
        param_dtype=param_dtype,
    )
    encoder = TransformerEncoder(
        n_layer=num_hidden_layers,
        d_model=hidden_size,
        n_head=num_attention_heads,
        dim_feedforward=intermediate_size,
        activation=intermediate_activation,
        layer_norm_eps=layer_norm_eps,
        dropout=dropout,
        norm_first=True,
        dtype=dtype,
        param_dtype=param_dtype,
        remat=remat,
        scan_layers=scan_layers,
        moe_num_experts=moe_num_experts,
        moe_top_k=moe_top_k,
        moe_capacity_factor=moe_capacity_factor,
        moe_interval=moe_interval,
        ep_axis_name=ep_axis_name,
    )
    return ImageTransformer(
        embeddings=embeddings,
        encoder=encoder,
        layernorm=Fp32LayerNorm(eps=layer_norm_eps, param_dtype=param_dtype),
        pooler=Pooler(hidden_size=hidden_size, dtype=dtype, param_dtype=param_dtype),
    )


class ImageTransformerWithVAE(nn.Module):
    """Image transformer + dVAE producing MIM labels (reference :281)."""

    image_transformer: nn.Module
    vae: nn.Module

    def __call__(
        self,
        pixel_values: jnp.ndarray,
        image_patches_mask: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> TransformerOutput:
        image_labels = self.vae(pixel_values).reshape(pixel_values.shape[0], -1)
        mask = image_patches_mask.reshape(pixel_values.shape[0], -1).astype(bool)
        image_labels = jnp.where(mask, image_labels, -1)
        out = self.image_transformer(
            pixel_values, image_patches_mask=image_patches_mask,
            attention_mask=attention_mask, deterministic=deterministic,
        )
        return TransformerOutput(
            last_hidden_state=out.last_hidden_state,
            pooler_output=out.pooler_output,
            hidden_states=out.hidden_states,
            attentions=out.attentions,
            image_labels=image_labels,
        )
