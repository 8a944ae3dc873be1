"""Q-Former layers.

Parity with reference ``models/blip2/qformer_layers.py`` (QformerLayer:19,
QformerEncoder:219, QformerEmbedding:310): POST-norm residuals, separate
feedforward stacks for the query slice (which also cross-attends the image)
vs the text slice, re-concatenated per layer.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.mlp import MLP
from multimodal_tpu.modules.layers.multi_head_attention import (
    MultiHeadAttentionWithCache,
)
from multimodal_tpu.modules.layers.normalizations import Fp32LayerNorm


class QformerLayer(nn.Module):
    dim_q: int
    dim_feedforward: int
    num_heads: int
    attn_dropout: float = 0.0
    dropout: float = 0.0
    layer_norm_eps: float = 1e-12
    activation: Union[str, Callable] = "relu"
    has_cross_attention: bool = False
    dim_kv: Optional[int] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.self_attention = MultiHeadAttentionWithCache(
            self.dim_q, self.dim_q, self.num_heads, self.attn_dropout,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        self.self_attn_layernorm = Fp32LayerNorm(
            eps=self.layer_norm_eps, param_dtype=self.param_dtype
        )
        self.residual_dropout = nn.Dropout(self.dropout)
        if self.has_cross_attention:
            if self.dim_kv is None:
                raise ValueError("key and value dim should be provided for cross attention.")
            self.cross_attention = MultiHeadAttentionWithCache(
                dim_q=self.dim_q, dim_kv=self.dim_kv, num_heads=self.num_heads,
                dropout=self.attn_dropout, dtype=self.dtype, param_dtype=self.param_dtype,
            )
            self.cross_attn_layernorm = Fp32LayerNorm(
                eps=self.layer_norm_eps, param_dtype=self.param_dtype
            )
        self.feedforward = MLP(
            self.dim_q, self.dim_q, self.dim_feedforward, dropout=0.0,
            activation=self.activation, dtype=self.dtype, param_dtype=self.param_dtype,
        )
        self.feedforward_layernorm = Fp32LayerNorm(
            eps=self.layer_norm_eps, param_dtype=self.param_dtype
        )
        self.feedforward_query = MLP(
            self.dim_q, self.dim_q, self.dim_feedforward, dropout=0.0,
            activation=self.activation, dtype=self.dtype, param_dtype=self.param_dtype,
        )
        self.feedforward_layernorm_query = Fp32LayerNorm(
            eps=self.layer_norm_eps, param_dtype=self.param_dtype
        )

    def __call__(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        past_key_value: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        query_length: int = 0,
        use_cache: bool = False,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
        drop = lambda t: self.residual_dropout(t, deterministic=deterministic)
        x = hidden_states

        attn_out = self.self_attention(
            x, x, x, attn_mask=attention_mask, past_key_value=past_key_value,
            use_cache=use_cache, deterministic=deterministic,
        )
        present_kv = None
        if use_cache:
            attn_val, present_kv = attn_out.attn_output, attn_out.past_key_value
        else:
            attn_val = attn_out
        attn_residual = self.self_attn_layernorm(drop(attn_val) + x)

        if query_length > 0:
            query_out = attn_residual[:, :query_length, :]
            if self.has_cross_attention:
                if encoder_hidden_states is None:
                    raise ValueError(
                        "encoder_hidden_states must be given for cross-attention layers"
                    )
                ca = self.cross_attention(
                    query_out, encoder_hidden_states, encoder_hidden_states,
                    deterministic=deterministic,
                )
                query_out = self.cross_attn_layernorm(drop(ca) + query_out)
            layer_out = self.feedforward_layernorm_query(
                drop(self.feedforward_query(query_out, deterministic=deterministic))
                + query_out
            )
            if attn_residual.shape[1] > query_length:
                text = attn_residual[:, query_length:, :]
                text_out = self.feedforward_layernorm(
                    drop(self.feedforward(text, deterministic=deterministic)) + text
                )
                layer_out = jnp.concatenate([layer_out, text_out], axis=1)
        else:
            layer_out = self.feedforward_layernorm(
                drop(self.feedforward(attn_residual, deterministic=deterministic))
                + attn_residual
            )
        return layer_out, present_kv


class QformerEncoder(nn.Module):
    num_hidden_layers: int
    dim_q: int
    dim_feedforward: int
    num_heads: int
    attn_dropout: float = 0.0
    dropout: float = 0.0
    layer_norm_eps: float = 1e-12
    activation: Union[str, Callable] = "relu"
    cross_attention_freq: int = 2
    dim_kv: Optional[int] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        past_key_values: Optional[List] = None,
        query_length: int = 0,
        use_cache: bool = False,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, List]:
        current_key_values = []
        for i in range(self.num_hidden_layers):
            pkv = past_key_values[i] if past_key_values is not None else None
            hidden_states, present = QformerLayer(
                dim_q=self.dim_q,
                dim_feedforward=self.dim_feedforward,
                num_heads=self.num_heads,
                attn_dropout=self.attn_dropout,
                dropout=self.dropout,
                layer_norm_eps=self.layer_norm_eps,
                activation=self.activation,
                has_cross_attention=(i % self.cross_attention_freq == 0),
                dim_kv=self.dim_kv,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )(
                hidden_states=hidden_states,
                attention_mask=attention_mask,
                encoder_hidden_states=encoder_hidden_states,
                past_key_value=pkv,
                query_length=query_length,
                use_cache=use_cache,
                deterministic=deterministic,
            )
            if use_cache:
                current_key_values.append(present)
        return hidden_states, current_key_values


class QformerEmbedding(nn.Module):
    embedding_dim: int
    max_position_embeddings: int
    vocab_size: int
    pad_token_id: int = 0
    layer_norm_eps: float = 1e-12
    dropout: float = 0.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        query_embeddings: Optional[jnp.ndarray] = None,
        past_seq_length: int = 0,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if input_ids is None and query_embeddings is None:
            raise ValueError("Either input_ids or query_embeddings must be passed.")
        embeddings = query_embeddings
        if input_ids is not None:
            seq_length = input_ids.shape[1]
            if position_ids is None:
                position_ids = jnp.arange(
                    past_seq_length, past_seq_length + seq_length, dtype=jnp.int32
                )[None]
            word = nn.Embed(
                self.vocab_size, self.embedding_dim,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="token_embeddings",
            )(input_ids)
            pos = nn.Embed(
                self.max_position_embeddings, self.embedding_dim,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="position_embeddings",
            )(position_ids)
            embeddings = word + pos
            if query_embeddings is not None:
                embeddings = jnp.concatenate([query_embeddings, embeddings], axis=1)
        embeddings = Fp32LayerNorm(
            eps=self.layer_norm_eps, param_dtype=self.param_dtype, name="layernorm"
        )(embeddings)
        return nn.Dropout(self.dropout, deterministic=deterministic)(embeddings)
