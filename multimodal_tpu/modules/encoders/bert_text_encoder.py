"""BERT-style composable text encoder.

Parity with reference ``modules/encoders/bert_text_encoder.py``
(BERTTextEncoder:17, bert_text_encoder builder). Masks are boolean
(True = attend), broadcast to ``(b, 1, 1, s)`` for the fused attention op.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Union

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.text_embedding import BERTTextEmbeddings
from multimodal_tpu.modules.layers.transformer import (
    TransformerEncoder,
    TransformerOutput,
)


class BERTTextEncoder(nn.Module):
    embeddings: nn.Module
    encoder: nn.Module
    layernorm: Optional[nn.Module] = None
    pooler: Optional[nn.Module] = None

    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        inputs_embeds: Optional[jnp.ndarray] = None,
        return_hidden_states: bool = False,
        return_attn_weights: bool = False,
        deterministic: bool = True,
    ) -> TransformerOutput:
        if input_ids is None and inputs_embeds is None:
            raise ValueError("input_ids or inputs_embeds must not be None")

        if attention_mask is None and input_ids is not None:
            pad_id = getattr(self.embeddings, "pad_token_id", None)
            if pad_id is not None:
                attention_mask = input_ids != pad_id
        if attention_mask is not None:
            # (b, s) -> (b, 1, 1, s) boolean broadcast over heads and queries
            attention_mask = attention_mask.astype(jnp.bool_)[:, None, None, :]

        embedding_output = self.embeddings(
            input_ids=input_ids,
            position_ids=position_ids,
            token_type_ids=token_type_ids,
            inputs_embeds=inputs_embeds,
            deterministic=deterministic,
        )
        # scan-layout encoders (scan_layers=True) have no per-layer taps;
        # synthesize the one tap FLAVA consumes (hidden_states[-1] = the
        # pre-final-LN last hidden state) from the scan carry instead.
        scanned = getattr(self.encoder, "scan_layers", False)
        encoder_output = self.encoder(
            embedding_output,
            attention_mask=attention_mask,
            return_hidden_states=return_hidden_states and not scanned,
            return_attn_weights=return_attn_weights and not scanned,
            deterministic=deterministic,
        )
        last_hidden_state = encoder_output.last_hidden_state
        hidden_states = encoder_output.hidden_states
        if scanned and return_hidden_states:
            hidden_states = (last_hidden_state,)
        pooled = encoder_output.pooler_output
        if self.layernorm is not None:
            last_hidden_state = self.layernorm(last_hidden_state)
        if self.pooler is not None:
            pooled = self.pooler(last_hidden_state)
        return TransformerOutput(
            last_hidden_state=last_hidden_state,
            pooler_output=pooled,
            hidden_states=hidden_states,
            attentions=encoder_output.attentions,
        )


def bert_text_encoder(
    hidden_size: int = 768,
    num_hidden_layers: int = 6,
    num_attention_heads: int = 12,
    intermediate_size: int = 3072,
    dropout: float = 0.1,
    transform_act_fn: Union[str, Callable] = "gelu",
    layer_norm_eps: float = 1e-12,
    norm_first: bool = False,
    vocab_size: int = 30522,
    max_position_embeddings: int = 512,
    type_vocab_size: int = 2,
    pad_token_id: int = 0,
    offset_pos_ids: bool = False,
    layernorm: Optional[nn.Module] = None,
    pooler: Optional[nn.Module] = None,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
) -> BERTTextEncoder:
    """Defaults match HuggingFace bert-base-uncased."""
    embeddings = BERTTextEmbeddings(
        hidden_size=hidden_size,
        vocab_size=vocab_size,
        pad_token_id=pad_token_id,
        max_position_embeddings=max_position_embeddings,
        type_vocab_size=type_vocab_size,
        layer_norm_eps=layer_norm_eps,
        dropout=dropout,
        offset_pos_ids=offset_pos_ids,
        dtype=dtype,
        param_dtype=param_dtype,
    )
    encoder = TransformerEncoder(
        n_layer=num_hidden_layers,
        d_model=hidden_size,
        n_head=num_attention_heads,
        dim_feedforward=intermediate_size,
        dropout=dropout,
        activation=transform_act_fn,
        layer_norm_eps=layer_norm_eps,
        norm_first=norm_first,
        dtype=dtype,
        param_dtype=param_dtype,
    )
    return BERTTextEncoder(
        embeddings=embeddings, encoder=encoder, layernorm=layernorm, pooler=pooler
    )
