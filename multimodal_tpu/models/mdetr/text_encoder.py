"""MDETR text encoder (RoBERTa-style) + feature resizer.

Parity with reference ``models/mdetr/text_encoder.py`` (ModifiedTransformerEncoder
wrapping HF RoBERTa:112, FeatureResizer:79, mdetr_roberta_text_encoder).
Built on the framework's BERT encoder configured roberta-base-like
(padding-aware position ids, vocab 50265, pad id 1).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.encoders.bert_text_encoder import (
    BERTTextEncoder,
    bert_text_encoder,
)


class FeatureResizer(nn.Module):
    """Linear + LayerNorm + dropout to resize text features (reference :79)."""

    output_feat_size: int
    dropout: float = 0.1
    do_ln: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, encoder_features: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.output_feat_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc")(encoder_features)
        if self.do_ln:
            x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                             param_dtype=self.param_dtype, name="layer_norm")(
                x.astype(jnp.float32)
            ).astype(x.dtype)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


def mdetr_roberta_text_encoder(
    hidden_size: int = 768,
    num_hidden_layers: int = 12,
    num_attention_heads: int = 12,
    intermediate_size: int = 3072,
    vocab_size: int = 50265,
    max_position_embeddings: int = 514,
    pad_token_id: int = 1,
    type_vocab_size: int = 1,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
) -> BERTTextEncoder:
    """roberta-base-config text encoder (HF config parity)."""
    return bert_text_encoder(
        hidden_size=hidden_size,
        num_hidden_layers=num_hidden_layers,
        num_attention_heads=num_attention_heads,
        intermediate_size=intermediate_size,
        vocab_size=vocab_size,
        max_position_embeddings=max_position_embeddings,
        pad_token_id=pad_token_id,
        type_vocab_size=type_vocab_size,
        offset_pos_ids=True,
        layer_norm_eps=1e-5,
        dropout=0.1,
        dtype=dtype,
        param_dtype=param_dtype,
    )
