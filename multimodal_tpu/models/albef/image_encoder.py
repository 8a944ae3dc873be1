"""ALBEF vision encoder (torchvision-style ViT ending at the final LN).

Parity with reference ``models/albef/image_encoder.py`` (ALBEFVisionEncoder:
feature-extracted ``encoder.ln`` output of a torchvision VisionTransformer).
Built from the framework's composable ViT (pre-norm blocks, GELU, final LN).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.encoders.vision_transformer import vision_transformer


class ALBEFVisionEncoder(nn.Module):
    image_size: int = 256
    patch_size: int = 16
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    hidden_size: int = 768
    mlp_dim: int = 3072
    dropout: float = 0.0
    attention_dropout: float = 0.0
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.vit = vision_transformer(
            image_size=self.image_size,
            patch_size=self.patch_size,
            n_layer=self.num_hidden_layers,
            n_head=self.num_attention_heads,
            hidden_dim=self.hidden_size,
            dim_feedforward=self.mlp_dim,
            transformer_dropout=self.dropout,
            layer_norm_eps=self.layer_norm_eps,
            final_layer_norm_eps=self.layer_norm_eps,
            norm_first=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: NHWC image -> (b, n_patches + 1, hidden) post final LN."""
        return self.vit(x, deterministic=deterministic).last_hidden_state
