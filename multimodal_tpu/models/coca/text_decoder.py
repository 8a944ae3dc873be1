"""CoCa text decoder.

Parity with reference ``models/coca/text_decoder.py`` (CoCaTextEmbeddings:15,
CoCaTextDecoder:84): CLS token APPENDED at sequence end (and the final input
token dropped to make room, :218-228), causal+padding combined mask
(build_mask:176-197), pooled = last position + ln_final + projection, or
EOT-argmax when ``embed_cls=False`` (:235-251), open_clip init scheme.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.transformer import TransformerDecoder


class CoCaTextEmbeddings(nn.Module):
    vocab_size: int
    num_positions: int
    embedding_dim: int
    pad_idx: Optional[int] = 0
    embed_cls: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        expected = self.num_positions - 1 if self.embed_cls else self.num_positions
        if input_ids.shape[1] != expected:
            raise ValueError(f"expected seq len {expected}, got {input_ids.shape[1]}")
        embeddings = nn.Embed(
            self.vocab_size, self.embedding_dim,
            embedding_init=nn.initializers.normal(0.02),
            dtype=self.dtype, param_dtype=self.param_dtype, name="token_embeddings",
        )(input_ids)
        if self.embed_cls:
            cls_embedding = self.param(
                "cls_embedding", nn.initializers.constant(0.01),
                (self.embedding_dim,), self.param_dtype,
            )
            cls = jnp.broadcast_to(
                cls_embedding.astype(embeddings.dtype)[None, None],
                (input_ids.shape[0], 1, self.embedding_dim),
            )
            embeddings = jnp.concatenate([embeddings, cls], axis=1)
        position_embeddings = self.param(
            "position_embeddings", nn.initializers.normal(0.01),
            (self.num_positions, self.embedding_dim), self.param_dtype,
        )
        return embeddings + position_embeddings.astype(embeddings.dtype)


class CoCaTextDecoder(nn.Module):
    vocab_size: int
    num_positions: int
    embedding_dim: int
    n_layer: int
    n_head: int
    dim_feedforward: int
    output_dim: int
    pad_idx: Optional[int] = 0
    embed_cls: bool = True
    dropout: float = 0.0
    activation: Union[str, Callable] = "gelu"
    layer_norm_eps: float = 1e-5
    norm_first: bool = True
    final_layer_norm_eps: Optional[float] = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.embeddings = CoCaTextEmbeddings(
            vocab_size=self.vocab_size,
            num_positions=self.num_positions,
            embedding_dim=self.embedding_dim,
            pad_idx=self.pad_idx,
            embed_cls=self.embed_cls,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.transformer_decoder = TransformerDecoder(
            n_layer=self.n_layer,
            d_model=self.embedding_dim,
            n_head=self.n_head,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            activation=self.activation,
            layer_norm_eps=self.layer_norm_eps,
            norm_first=self.norm_first,
            use_cross_attention=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        if self.final_layer_norm_eps is not None:
            self.ln_final = nn.LayerNorm(
                epsilon=self.final_layer_norm_eps, dtype=jnp.float32,
                param_dtype=self.param_dtype,
            )
        self.text_projection = nn.Dense(
            self.output_dim, use_bias=False,
            kernel_init=nn.initializers.normal(self.embedding_dim ** 0.5),
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

    def build_mask(
        self,
        input_ids: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        seq_len = input_ids.shape[1] + (1 if self.embed_cls else 0)
        causal = jnp.tril(jnp.ones((seq_len, seq_len), bool))
        if not self.embed_cls or self.pad_idx is None:
            return causal[None, None]
        if padding_mask is None:
            padding_mask = input_ids != self.pad_idx
        # key-padding: (b, s) -> (b, 1, s+1) with CLS position always attendable
        pm = jnp.pad(
            padding_mask.astype(bool)[:, None, :],
            ((0, 0), (0, 0), (0, 1)), constant_values=True,
        )
        return (pm & causal[None])[:, None]  # (b, 1, s+1, s+1)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.embed_cls:
            if input_ids.shape[1] == self.num_positions:
                input_ids = input_ids[:, :-1]
            if padding_mask is not None and padding_mask.shape[1] == self.num_positions:
                padding_mask = padding_mask[:, :-1]

        embeddings = self.embeddings(input_ids)
        mask = self.build_mask(input_ids, padding_mask)
        decoder_out = self.transformer_decoder(
            embeddings, attention_mask=mask, deterministic=deterministic
        )
        hidden = decoder_out.last_hidden_state
        if self.embed_cls:
            pooled, tokens = hidden[:, -1], hidden[:, :-1]
            if self.final_layer_norm_eps is not None:
                pooled = self.ln_final(pooled.astype(jnp.float32)).astype(hidden.dtype)
        else:
            hidden = self.ln_final(hidden.astype(jnp.float32)).astype(hidden.dtype)
            eot = jnp.argmax(input_ids, axis=-1)
            pooled = jnp.take_along_axis(hidden, eot[:, None, None], axis=1)[:, 0]
            tokens = hidden
        pooled = self.text_projection(pooled)
        return pooled, tokens
