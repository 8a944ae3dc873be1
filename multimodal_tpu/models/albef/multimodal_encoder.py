"""ALBEF multimodal encoder (text queries cross-attending image).

Parity with reference ``models/albef/multimodal_encoder.py``
(TransformerCrossAttentionLayer:17, ALBEFMultimodalEncoder:184).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Union

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.mlp import MLP
from multimodal_tpu.modules.layers.multi_head_attention import (
    MultiHeadAttentionWithCache,
)
from multimodal_tpu.modules.layers.normalizations import Fp32LayerNorm


class TransformerCrossAttentionLayer(nn.Module):
    """Self-attn + cross-attn + MLP with pre/post norm (reference :17)."""

    d_model: int
    n_head: int
    dim_feedforward: int
    dropout: float = 0.0
    activation: Union[str, Callable] = "relu"
    layer_norm_eps: float = 1e-12
    norm_first: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        cross_attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        mha = lambda name: MultiHeadAttentionWithCache(
            dim_q=self.d_model, dim_kv=self.d_model, num_heads=self.n_head,
            dropout=self.dropout, dtype=self.dtype, param_dtype=self.param_dtype,
            name=name,
        )
        ln = lambda name: Fp32LayerNorm(
            eps=self.layer_norm_eps, param_dtype=self.param_dtype, name=name
        )
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        attn = mha("attention")
        cross = mha("cross_attention")
        ff = MLP(
            self.d_model, self.d_model, self.dim_feedforward,
            dropout=self.dropout, activation=self.activation,
            dtype=self.dtype, param_dtype=self.param_dtype, name="feedforward",
        )
        ln_attn, ln_cross, ln_ff = ln("attention_layernorm"), ln("cross_attention_layernorm"), ln("feedforward_layernorm")

        x = hidden_states
        if self.norm_first:
            h = ln_attn(x)
            x = x + drop(attn(h, h, h, attn_mask=attention_mask, deterministic=deterministic))
            h = ln_cross(x)
            x = x + drop(cross(
                h, encoder_hidden_states, encoder_hidden_states,
                attn_mask=cross_attention_mask, deterministic=deterministic,
            ))
            x = x + drop(ff(ln_ff(x), deterministic=deterministic))
        else:
            x = ln_attn(x + drop(attn(x, x, x, attn_mask=attention_mask, deterministic=deterministic)))
            x = ln_cross(x + drop(cross(
                x, encoder_hidden_states, encoder_hidden_states,
                attn_mask=cross_attention_mask, deterministic=deterministic,
            )))
            x = ln_ff(x + drop(ff(x, deterministic=deterministic)))
        return x


class ALBEFMultimodalEncoder(nn.Module):
    """Stack of cross-attention layers: text hidden states attend to image
    (reference :184)."""

    hidden_size: int = 768
    num_hidden_layers: int = 6
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-12
    transform_act_fn: Union[str, Callable] = "gelu"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if attention_mask is not None:
            attention_mask = attention_mask.astype(jnp.bool_)[:, None, None, :]
        for i in range(self.num_hidden_layers):
            hidden_states = TransformerCrossAttentionLayer(
                d_model=self.hidden_size,
                n_head=self.num_attention_heads,
                dim_feedforward=self.intermediate_size,
                activation=self.transform_act_fn,
                layer_norm_eps=self.layer_norm_eps,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )(
                hidden_states,
                encoder_hidden_states,
                attention_mask=attention_mask,
                deterministic=deterministic,
            )
        return hidden_states
