"""BERT-style text embeddings.

Parity with reference ``modules/layers/text_embedding.py:13``
(BERTTextEmbeddings): word + absolute-position + token-type embeddings,
LayerNorm, dropout, with RoBERTa-style padding-aware position-id offsets.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.normalizations import Fp32LayerNorm


class BERTTextEmbeddings(nn.Module):
    hidden_size: int = 768
    vocab_size: int = 30522
    pad_token_id: int = 0
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dropout: float = 0.0
    offset_pos_ids: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def create_position_ids_from_input_ids(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """RoBERTa positions: count non-pad tokens, offset by pad_token_id."""
        mask = (input_ids != self.pad_token_id).astype(jnp.int32)
        incremental = jnp.cumsum(mask, axis=1) * mask
        return incremental + self.pad_token_id

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        inputs_embeds: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if input_ids is not None:
            input_shape = input_ids.shape
        elif inputs_embeds is not None:
            input_shape = inputs_embeds.shape[:-1]
        else:
            raise ValueError("input_ids or inputs_embeds must not be None")
        seq_length = input_shape[1]

        if position_ids is None:
            if self.offset_pos_ids:
                position_ids = self.create_position_ids_from_input_ids(input_ids)
            else:
                position_ids = jnp.broadcast_to(
                    jnp.arange(seq_length, dtype=jnp.int32)[None, :], input_shape
                )
        if token_type_ids is None:
            token_type_ids = jnp.zeros(input_shape, dtype=jnp.int32)

        if inputs_embeds is None:
            inputs_embeds = nn.Embed(
                self.vocab_size, self.hidden_size,
                dtype=self.dtype, param_dtype=self.param_dtype, name="word_embeddings",
            )(input_ids)
        position_embeddings = nn.Embed(
            self.max_position_embeddings, self.hidden_size,
            dtype=self.dtype, param_dtype=self.param_dtype, name="position_embeddings",
        )(position_ids)
        token_type_embeddings = nn.Embed(
            self.type_vocab_size, self.hidden_size,
            dtype=self.dtype, param_dtype=self.param_dtype, name="token_type_embeddings",
        )(token_type_ids)

        embeddings = inputs_embeds + position_embeddings + token_type_embeddings
        embeddings = Fp32LayerNorm(
            eps=self.layer_norm_eps, param_dtype=self.param_dtype, name="layer_norm"
        )(embeddings)
        return nn.Dropout(self.dropout, deterministic=deterministic)(embeddings)
