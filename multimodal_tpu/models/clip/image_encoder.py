"""CLIP ViT image encoder.

Parity with reference ``models/clip/image_encoder.py:22-113``
(CLIPViTEncoder): bias-free conv patchify, CLS token, learned positional
embedding, fp32 ln_pre/ln_post, pre-norm transformer with quick-GELU, CLS
pooling, final ``x @ projection``. Input layout is NHWC (TPU-native);
the weight converter transposes the reference's NCHW conv kernels.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.models.clip.transformer import CLIPTransformer
from multimodal_tpu.modules.layers.normalizations import Fp32LayerNorm


class CLIPViTEncoder(nn.Module):
    embedding_dim: int
    patch_size: int
    image_size: int
    width: int
    heads: int
    layers: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (b, image_size, image_size, 3) NHWC."""
        b, hgt, wdt, c = x.shape
        if hgt != self.image_size or wdt != self.image_size:
            raise ValueError(
                f"Expected input height/width {self.image_size}, found {hgt}x{wdt}"
            )
        if c != 3:
            raise ValueError(f"Expected 3 channels, found {c}")

        scale = self.width ** -0.5
        patches = nn.Conv(
            self.width,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x.astype(self.dtype))
        n_patches = (self.image_size // self.patch_size) ** 2
        patches = patches.reshape(b, n_patches, self.width)

        cls_token = self.param(
            "cls_token_embedding", nn.initializers.normal(scale),
            (self.width,), self.param_dtype,
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(scale),
            (n_patches + 1, self.width), self.param_dtype,
        )
        cls = jnp.broadcast_to(
            cls_token.astype(patches.dtype)[None, None, :], (b, 1, self.width)
        )
        h = jnp.concatenate([cls, patches], axis=1) + pos.astype(patches.dtype)

        h = Fp32LayerNorm(eps=1e-5, param_dtype=self.param_dtype, name="ln_pre")(h)
        h = CLIPTransformer(
            self.width, self.heads, self.layers,
            dtype=self.dtype, param_dtype=self.param_dtype, name="encoder",
        )(h)
        pooled = Fp32LayerNorm(eps=1e-5, param_dtype=self.param_dtype, name="ln_post")(
            h[:, 0, :]
        )
        projection = self.param(
            "projection", nn.initializers.normal(scale),
            (self.width, self.embedding_dim), self.param_dtype,
        )
        return jnp.dot(
            pooled, projection.astype(pooled.dtype),
            preferred_element_type=jnp.float32,
        ).astype(pooled.dtype)
