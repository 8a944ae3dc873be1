"""CLIP text encoder.

Parity with reference ``models/clip/text_encoder.py`` (CLIPTextEncoder:15):
63M-param causal transformer, fp32 ln_final, EOT-token pooling via argmax
over token ids (``:129-132``), bias-free linear projection, CLIP init stds
(``:82-104``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.models.clip.transformer import CLIPTransformer
from multimodal_tpu.modules.layers.normalizations import Fp32LayerNorm


class CLIPTextEncoder(nn.Module):
    embedding_dim: int = 512
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    dim_feedforward: int = 2048
    heads: int = 8
    layers: int = 12
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    TOKEN_EMBEDDING_INIT_STD = 0.02
    POS_EMBEDDING_INIT_STD = 0.01

    @nn.compact
    def __call__(self, text: jnp.ndarray, return_hidden_state: bool = False) -> jnp.ndarray:
        if text.shape[1] != self.context_length:
            raise ValueError(
                f"length of input should be {self.context_length} but found {text.shape[1]}"
            )
        embeddings = nn.Embed(
            self.vocab_size, self.width,
            embedding_init=nn.initializers.normal(self.TOKEN_EMBEDDING_INIT_STD),
            dtype=self.dtype, param_dtype=self.param_dtype, name="token_embedding",
        )(text)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.POS_EMBEDDING_INIT_STD),
            (self.context_length, self.width), self.param_dtype,
        )
        h = embeddings + pos.astype(embeddings.dtype)
        h = CLIPTransformer(
            self.width, self.heads, self.layers, self.dim_feedforward,
            dtype=self.dtype, param_dtype=self.param_dtype, name="encoder",
        )(h, is_causal=True)
        hidden_state = Fp32LayerNorm(
            eps=1e-5, param_dtype=self.param_dtype, name="ln_final"
        )(h)
        if return_hidden_state:
            return hidden_state

        # EOT pooling: the EOT token has the highest id in each sequence.
        eot_idx = jnp.argmax(text, axis=-1)
        pooled = jnp.take_along_axis(
            hidden_state, eot_idx[:, None, None], axis=1
        )[:, 0]
        return nn.Dense(
            self.embedding_dim, use_bias=False,
            kernel_init=nn.initializers.normal(self.width ** -0.5),
            dtype=self.dtype, param_dtype=self.param_dtype, name="projection",
        )(pooled)
