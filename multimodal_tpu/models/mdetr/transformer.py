"""MDETR multimodal transformer.

Parity with reference ``models/mdetr/transformer.py`` (MDETRTransformer:20,
encoder/decoder layers :263-449): DETR-style layers where positional
embeddings are re-added to Q/K at EVERY layer (not once at the input),
encoder runs over concat[image tokens; text tokens] with zero pos-emb for
text (:113-114), decoder starts from zero targets (:106) with learned query
embeddings added each layer, returning all intermediate decoder states.
Batch-first layout.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.mlp import MLP
from multimodal_tpu.modules.layers.multi_head_attention import (
    MultiHeadAttentionWithCache,
)


class MDETRTransformerOutput(NamedTuple):
    decoder_hidden_states: jnp.ndarray  # (n_layers, b, num_queries, d)
    text_memory: jnp.ndarray


def _key_padding_bias(key_padding_mask: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """(b, k) True = PADDED -> boolean attend-mask (b, 1, 1, k)."""
    if key_padding_mask is None:
        return None
    return (~key_padding_mask)[:, None, None, :]


class MDETREncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: Union[str, Callable] = "relu"
    normalize_before: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, src_key_padding_mask=None, pos=None, deterministic=True):
        attn = MultiHeadAttentionWithCache(
            self.d_model, self.d_model, self.num_heads, self.dropout,
            dtype=self.dtype, param_dtype=self.param_dtype, name="self_attn",
        )
        mlp = MLP(self.d_model, self.d_model, [self.dim_feedforward], self.dropout,
                  self.activation, dtype=self.dtype, param_dtype=self.param_dtype,
                  name="mlp")
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       param_dtype=self.param_dtype, name=name)
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        mask = _key_padding_bias(src_key_padding_mask)
        with_pos = lambda t: t if pos is None else t + pos

        x = src
        if self.normalize_before:
            h = ln("norm1")(x.astype(jnp.float32)).astype(x.dtype)
            q = k = with_pos(h)
            x = x + drop(attn(q, k, h, attn_mask=mask, deterministic=deterministic))
            h = ln("norm2")(x.astype(jnp.float32)).astype(x.dtype)
            x = x + drop(mlp(h, deterministic=deterministic))
        else:
            q = k = with_pos(x)
            x = x + drop(attn(q, k, x, attn_mask=mask, deterministic=deterministic))
            x = ln("norm1")(x.astype(jnp.float32)).astype(x.dtype)
            x = x + drop(mlp(x, deterministic=deterministic))
            x = ln("norm2")(x.astype(jnp.float32)).astype(x.dtype)
        return x


class MDETRDecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: Union[str, Callable] = "relu"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, memory_key_padding_mask=None, pos=None,
                 query_pos=None, deterministic=True):
        mha = lambda name: MultiHeadAttentionWithCache(
            self.d_model, self.d_model, self.num_heads, self.dropout,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       param_dtype=self.param_dtype, name=name)
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        with_qpos = lambda t: t if query_pos is None else t + query_pos
        with_pos = lambda t: t if pos is None else t + pos

        x = tgt
        q = k = with_qpos(x)
        x = x + drop(mha("self_attn")(q, k, x, deterministic=deterministic))
        x = ln("norm1")(x.astype(jnp.float32)).astype(x.dtype)
        x = x + drop(mha("cross_attn_image")(
            with_qpos(x), with_pos(memory), memory,
            attn_mask=_key_padding_bias(memory_key_padding_mask),
            deterministic=deterministic,
        ))
        x = ln("norm3")(x.astype(jnp.float32)).astype(x.dtype)
        x = x + drop(MLP(
            self.d_model, self.d_model, [self.dim_feedforward], self.dropout,
            self.activation, dtype=self.dtype, param_dtype=self.param_dtype,
            name="mlp",
        )(x, deterministic=deterministic))
        return ln("norm4")(x.astype(jnp.float32)).astype(x.dtype)


class MDETRTransformer(nn.Module):
    d_model: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: Union[str, Callable] = "relu"
    normalize_before: bool = False
    return_intermediate_dec: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_embeddings: jnp.ndarray,  # (b, fh, fw, d)
        image_mask: jnp.ndarray,        # (b, fh, fw) True = padded
        query_embed: jnp.ndarray,       # (num_queries, d)
        pos_embed: jnp.ndarray,         # (b, fh, fw, d)
        text_memory: jnp.ndarray,       # (b, text_len, d)
        text_attention_mask: jnp.ndarray,  # (b, text_len) True = padded
        deterministic: bool = True,
    ) -> MDETRTransformerOutput:
        b = image_embeddings.shape[0]
        img_tokens = image_embeddings.reshape(b, -1, self.d_model)
        pos = pos_embed.reshape(b, -1, self.d_model)
        img_mask = image_mask.reshape(b, -1)

        mm = jnp.concatenate([img_tokens, text_memory], axis=1)
        mm_mask = jnp.concatenate([img_mask, text_attention_mask], axis=1)
        # zero pos-emb for text so adding is a no-op (reference :113-114)
        pos = jnp.concatenate([pos, jnp.zeros_like(text_memory)], axis=1)

        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        for i in range(self.num_encoder_layers):
            mm = MDETREncoderLayer(
                self.d_model, self.num_heads, self.dim_feedforward, self.dropout,
                self.activation, self.normalize_before, name=f"encoder_{i}", **common,
            )(mm, mm_mask, pos, deterministic)
        if self.normalize_before:
            mm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              param_dtype=self.param_dtype, name="encoder_norm")(
                mm.astype(jnp.float32)
            ).astype(mm.dtype)

        text_len = text_memory.shape[1]
        text_out = mm[:, -text_len:]

        queries = jnp.broadcast_to(
            query_embed[None].astype(mm.dtype), (b,) + query_embed.shape
        )
        tgt = jnp.zeros_like(queries)
        # single shared final norm applied to every intermediate state
        # (reference TransformerDecoder :185-262)
        decoder_norm = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
            name="decoder_norm",
        )
        norm = lambda t: decoder_norm(t.astype(jnp.float32)).astype(t.dtype)
        intermediates = []
        for i in range(self.num_decoder_layers):
            tgt = MDETRDecoderLayer(
                self.d_model, self.num_heads, self.dim_feedforward, self.dropout,
                self.activation, name=f"decoder_{i}", **common,
            )(tgt, mm, mm_mask, pos, queries, deterministic)
            if self.return_intermediate_dec:
                intermediates.append(norm(tgt))
        hs = jnp.stack(intermediates) if self.return_intermediate_dec else norm(tgt)[None]
        return MDETRTransformerOutput(decoder_hidden_states=hs, text_memory=text_out)
