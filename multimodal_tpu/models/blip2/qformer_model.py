"""Q-Former model + causal-LM wrapper.

Parity with reference ``models/blip2/qformer_model.py`` (QformerModel:14,
QformerPredictionHead:147, QformerForCLM:185).
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.models.blip2.qformer_layers import QformerEmbedding, QformerEncoder
from multimodal_tpu.models.blip2.qformer_utils import get_causal_mask
from multimodal_tpu.modules.layers.activation import get_activation


class QformerModel(nn.Module):
    num_hidden_layers: int
    dim_q: int
    dim_feedforward: int
    num_heads: int
    max_position_embeddings: int
    vocab_size: int
    pad_token_id: int = 0
    query_length: int = 32
    dim_kv: Optional[int] = None
    layer_norm_eps: float = 1e-12
    activation: Union[str, Callable] = "relu"
    attn_dropout: float = 0.0
    dropout: float = 0.0
    cross_attention_freq: int = 2
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.embeddings = QformerEmbedding(
            embedding_dim=self.dim_q,
            max_position_embeddings=self.max_position_embeddings,
            vocab_size=self.vocab_size,
            pad_token_id=self.pad_token_id,
            layer_norm_eps=self.layer_norm_eps,
            dropout=self.dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.encoder = QformerEncoder(
            num_hidden_layers=self.num_hidden_layers,
            dim_q=self.dim_q,
            dim_feedforward=self.dim_feedforward,
            num_heads=self.num_heads,
            attn_dropout=self.attn_dropout,
            dropout=self.dropout,
            layer_norm_eps=self.layer_norm_eps,
            activation=self.activation,
            cross_attention_freq=self.cross_attention_freq,
            dim_kv=self.dim_kv,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        query_embeds: Optional[jnp.ndarray] = None,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        past_key_values: Optional[List] = None,
        use_cache: bool = False,
        use_causal_mask: bool = False,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, List]:
        past_seq_length = (
            past_key_values[0][0].shape[2] - self.query_length
            if past_key_values is not None
            else 0
        )
        query_length = query_embeds.shape[1] if query_embeds is not None else 0

        embedding_output = self.embeddings(
            input_ids=input_ids,
            position_ids=position_ids,
            query_embeddings=query_embeds,
            past_seq_length=past_seq_length,
            deterministic=deterministic,
        )
        bsz, seq_len = embedding_output.shape[:2]

        mask_bias = None
        if attention_mask is not None:
            attention_mask = attention_mask.astype(jnp.float32)
            if use_causal_mask:
                causal = get_causal_mask(
                    attention_mask, (bsz, seq_len), has_query=query_embeds is not None
                )
                extended = causal[:, None, :, :] * attention_mask[:, None, None, :]
            else:
                extended = attention_mask[:, None, None, :]
            mask_bias = (1.0 - extended) * -10000.0

        return self.encoder(
            hidden_states=embedding_output,
            attention_mask=mask_bias,
            encoder_hidden_states=encoder_hidden_states,
            past_key_values=past_key_values,
            use_cache=use_cache,
            query_length=query_length,
            deterministic=deterministic,
        )


class QformerPredictionHead(nn.Module):
    dim_q: int
    vocab_size: int
    layer_norm_eps: float = 1e-12
    activation: Union[str, Callable] = "gelu"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sequence_output: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.dim_q, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="linear_1")(sequence_output)
        h = get_activation(self.activation)(h)
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="layernorm")(
            h.astype(jnp.float32)
        ).astype(h.dtype)
        return nn.Dense(self.vocab_size, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="linear_2")(h)


class QformerForCLM(nn.Module):
    """Q-Former wrapper for causal language modeling (reference :185)."""

    num_hidden_layers: int
    dim_q: int
    dim_feedforward: int
    num_heads: int
    max_position_embeddings: int
    vocab_size: int
    pad_token_id: int = 0
    query_length: int = 32
    dim_kv: Optional[int] = None
    layer_norm_eps: float = 1e-12
    activation: Union[str, Callable] = "gelu"
    attn_dropout: float = 0.0
    dropout: float = 0.0
    cross_attention_freq: int = 2
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.head = QformerPredictionHead(
            dim_q=self.dim_q,
            activation=self.activation,
            layer_norm_eps=self.layer_norm_eps,
            vocab_size=self.vocab_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.model = QformerModel(
            num_hidden_layers=self.num_hidden_layers,
            dim_q=self.dim_q,
            dim_feedforward=self.dim_feedforward,
            num_heads=self.num_heads,
            max_position_embeddings=self.max_position_embeddings,
            vocab_size=self.vocab_size,
            pad_token_id=self.pad_token_id,
            query_length=self.query_length,
            dim_kv=self.dim_kv,
            layer_norm_eps=self.layer_norm_eps,
            activation=self.activation,
            attn_dropout=self.attn_dropout,
            dropout=self.dropout,
            cross_attention_freq=self.cross_attention_freq,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        query_embeds: Optional[jnp.ndarray] = None,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        past_key_values: Optional[List] = None,
        use_cache: bool = False,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if past_key_values is not None and query_embeds is not None:
            raise ValueError("cannot pass both past_key_values and query_embeds")
        sequence_output, _ = self.model(
            input_ids=input_ids,
            attention_mask=attention_mask,
            position_ids=position_ids,
            query_embeds=query_embeds,
            encoder_hidden_states=encoder_hidden_states,
            past_key_values=past_key_values,
            use_cache=use_cache,
            use_causal_mask=True,
            deterministic=deterministic,
        )
        if query_embeds is not None:
            sequence_output = sequence_output[:, query_embeds.shape[1]:, :]
        return self.head(sequence_output)
