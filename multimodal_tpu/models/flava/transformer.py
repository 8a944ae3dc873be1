"""FLAVA multimodal transformer wrapper.

Parity with reference ``models/flava/transformer.py``
(FLAVATransformerWithoutEmbeddings:18, init_transformer_weights:296). The
encoder itself reuses ``modules/layers/transformer.TransformerEncoder``
(pre-norm, returns hidden states + attention weights); final LN lives
outside the encoder stack, matching FLAVA's layout.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.transformer import TransformerOutput

# FLAVA init: truncated-normal(0.02) dense/embedding weights, zero biases.
flava_dense_init = nn.initializers.normal(stddev=0.02)


class FLAVATransformerWithoutEmbeddings(nn.Module):
    """Multimodal encoder over pre-embedded inputs, with fresh CLS token."""

    encoder: nn.Module
    layernorm: nn.Module
    pooler: Optional[nn.Module] = None
    hidden_size: int = 768
    use_cls_token: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> TransformerOutput:
        if self.use_cls_token:
            cls_token = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, self.hidden_size),
                self.param_dtype,
            )
            b = hidden_states.shape[0]
            cls = jnp.broadcast_to(
                cls_token.astype(hidden_states.dtype), (b, 1, self.hidden_size)
            )
            hidden_states = jnp.concatenate([cls, hidden_states], axis=1)

        scanned = getattr(self.encoder, "scan_layers", False)
        encoder_output = self.encoder(
            hidden_states,
            attention_mask=attention_mask,
            return_hidden_states=not scanned,
            return_attn_weights=not scanned,
            deterministic=deterministic,
        )
        taps = encoder_output.hidden_states
        if scanned:
            taps = (encoder_output.last_hidden_state,)
        sequence_output = self.layernorm(encoder_output.last_hidden_state)
        pooled = self.pooler(sequence_output) if self.pooler is not None else None
        return TransformerOutput(
            last_hidden_state=sequence_output,
            pooler_output=pooled,
            hidden_states=taps,
            attentions=encoder_output.attentions,
        )
