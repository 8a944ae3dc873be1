"""CoCa multimodal decoder.

Parity with reference ``models/coca/multimodal_decoder.py``
(CoCaMultimodalDecoder:15): causal transformer over text tokens
cross-attending pooled image tokens, optional output projection.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Union

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.transformer import TransformerDecoder


class CoCaMultimodalDecoder(nn.Module):
    input_seq_len: int
    text_embedding_dim: int
    n_layer: int
    n_head: int
    dim_feedforward: int
    output_dim: Optional[int] = None
    dropout: float = 0.0
    activation: Union[str, Callable] = "gelu"
    layer_norm_eps: float = 1e-5
    norm_first: bool = True
    final_layer_norm_eps: Optional[float] = 1e-5
    visual_embedding_dim: Optional[int] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        texts: jnp.ndarray,
        images: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        seq_len = texts.shape[1]
        if seq_len != self.input_seq_len:
            raise ValueError(f"expected text seq len {self.input_seq_len}, got {seq_len}")
        causal = jnp.tril(jnp.ones((seq_len, seq_len), bool))[None, None]
        out = TransformerDecoder(
            n_layer=self.n_layer,
            d_model=self.text_embedding_dim,
            n_head=self.n_head,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            activation=self.activation,
            layer_norm_eps=self.layer_norm_eps,
            norm_first=self.norm_first,
            use_cross_attention=True,
            dim_kv=self.visual_embedding_dim,
            final_layer_norm_eps=self.final_layer_norm_eps,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="transformer_decoder",
        )(
            texts,
            encoder_hidden_states=images,
            attention_mask=causal,
            deterministic=deterministic,
        )
        hidden = out.last_hidden_state
        if self.output_dim is not None:
            hidden = nn.Dense(
                self.output_dim, use_bias=False, dtype=self.dtype,
                param_dtype=self.param_dtype, name="output_projection",
            )(hidden)
        return hidden
