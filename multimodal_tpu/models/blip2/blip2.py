"""BLIP-2 main model.

Parity with reference ``models/blip2/blip2.py`` (BLIP2:38, Blip2Output:16):
frozen ViT (stop_gradient), 32 learned query tokens, Q-Former with
image-conditioned KV cache reuse for the causal LM pass, 256-d joint
projections. ``itm_forward`` exposes the Q-Former re-run over
(pos, neg, neg) batches used by the stage-1 ITM loss.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.transformer import TransformerOutput


class Blip2Output(NamedTuple):
    image_embeddings: jnp.ndarray
    image_features: jnp.ndarray
    image_qformer_output: jnp.ndarray
    text_features: Optional[jnp.ndarray] = None
    prediction_scores: Optional[jnp.ndarray] = None


def _l2norm(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class BLIP2(nn.Module):
    qformer: nn.Module  # QformerForCLM
    vision_encoder: nn.Module
    dim_q: int
    image_encoder_embedding_dim: int
    freeze_vision_encoder: bool = True
    cross_attention_freq: int = 2
    embedding_dim: int = 256
    num_query_token: int = 32
    decoder_bos_token_id: Optional[int] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.query_tokens = self.param(
            "query_tokens", nn.initializers.normal(0.02),
            (1, self.num_query_token, self.dim_q), self.param_dtype,
        )
        self.vision_proj = nn.Dense(
            self.embedding_dim, dtype=self.dtype, param_dtype=self.param_dtype
        )
        self.text_proj = nn.Dense(
            self.embedding_dim, dtype=self.dtype, param_dtype=self.param_dtype
        )
        self.ln_vision = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype
        )

    def encode_image(self, image: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        vision_out = self.vision_encoder(image, deterministic=True)
        if isinstance(vision_out, TransformerOutput):
            vision_out = vision_out.last_hidden_state
        if self.freeze_vision_encoder:
            vision_out = jax.lax.stop_gradient(vision_out)
        return self.ln_vision(vision_out.astype(jnp.float32)).astype(self.dtype)

    def itm_forward(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        image_embeds: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Q-Former over [queries; text] conditioned on images; returns the
        query-token slice of the output (for the ITM head)."""
        b = input_ids.shape[0]
        query_tokens = jnp.broadcast_to(
            self.query_tokens.astype(self.dtype),
            (b, self.num_query_token, self.dim_q),
        )
        query_atts = jnp.ones(query_tokens.shape[:-1], jnp.int32)
        full_mask = jnp.concatenate([query_atts, attention_mask], axis=1)
        out, _ = self.qformer.model(
            input_ids=input_ids,
            query_embeds=query_tokens,
            attention_mask=full_mask,
            encoder_hidden_states=image_embeds,
            deterministic=deterministic,
        )
        return out[:, : self.num_query_token, :]

    def __call__(
        self,
        image: jnp.ndarray,
        input_ids: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Blip2Output:
        image_embeds = self.encode_image(image, deterministic=deterministic)
        query_tokens = jnp.broadcast_to(
            self.query_tokens.astype(self.dtype),
            (image_embeds.shape[0], self.num_query_token, self.dim_q),
        )
        query_output, query_kv_cache = self.qformer.model(
            query_embeds=query_tokens,
            encoder_hidden_states=image_embeds,
            use_cache=True,
            deterministic=deterministic,
        )
        image_feats = _l2norm(self.vision_proj(query_output))

        text_feats = None
        prediction_scores = None
        if input_ids is not None:
            text_output, _ = self.qformer.model(
                input_ids=input_ids,
                attention_mask=attention_mask,
                use_cache=False,
                deterministic=deterministic,
            )
            text_feats = _l2norm(self.text_proj(text_output[:, 0, :]))

            decoder_input_ids = input_ids
            if self.decoder_bos_token_id is not None:
                decoder_input_ids = input_ids.at[:, 0].set(self.decoder_bos_token_id)
            query_atts = jnp.ones(query_tokens.shape[:-1], jnp.int32)
            full_mask = attention_mask
            if attention_mask is not None:
                full_mask = jnp.concatenate([query_atts, attention_mask], axis=1)
            prediction_scores = self.qformer(
                input_ids=decoder_input_ids,
                attention_mask=full_mask,
                past_key_values=query_kv_cache,
                use_cache=False,
                deterministic=deterministic,
            )

        return Blip2Output(
            image_embeddings=image_embeds,
            image_features=image_feats,
            image_qformer_output=query_output,
            text_features=text_feats,
            prediction_scores=prediction_scores,
        )
