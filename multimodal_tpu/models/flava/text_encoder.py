"""FLAVA text encoder builder.

Parity with reference ``models/flava/text_encoder.py`` (flava_text_encoder):
BERT embeddings + pre-norm encoder + external Fp32 LN + CLS pooler.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Union

import jax.numpy as jnp

from multimodal_tpu.modules.encoders.bert_text_encoder import BERTTextEncoder
from multimodal_tpu.modules.layers.normalizations import Fp32LayerNorm
from multimodal_tpu.modules.layers.text_embedding import BERTTextEmbeddings
from multimodal_tpu.modules.layers.transformer import TransformerEncoder
from multimodal_tpu.modules.losses.flava import Pooler


def flava_text_encoder(
    num_hidden_layers: int = 12,
    hidden_size: int = 768,
    num_attention_heads: int = 12,
    intermediate_size: int = 3072,
    intermediate_activation: Union[str, Callable] = "gelu",
    layer_norm_eps: float = 1e-12,
    dropout: float = 0.0,
    vocab_size: int = 30522,
    pad_token_id: int = 0,
    type_vocab_size: int = 2,
    max_position_embeddings: int = 512,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
    remat: bool = False,
    scan_layers: bool = False,
    moe_num_experts: Optional[int] = None,
    moe_top_k: int = 2,
    moe_capacity_factor: float = 1.25,
    moe_interval: int = 2,
    ep_axis_name: Optional[str] = None,
) -> BERTTextEncoder:
    embeddings = BERTTextEmbeddings(
        hidden_size=hidden_size,
        vocab_size=vocab_size,
        pad_token_id=pad_token_id,
        type_vocab_size=type_vocab_size,
        max_position_embeddings=max_position_embeddings,
        layer_norm_eps=layer_norm_eps,
        dropout=dropout,
        dtype=dtype,
        param_dtype=param_dtype,
    )
    encoder = TransformerEncoder(
        n_layer=num_hidden_layers,
        d_model=hidden_size,
        n_head=num_attention_heads,
        dim_feedforward=intermediate_size,
        activation=intermediate_activation,
        layer_norm_eps=layer_norm_eps,
        dropout=dropout,
        norm_first=True,
        dtype=dtype,
        param_dtype=param_dtype,
        remat=remat,
        scan_layers=scan_layers,
        moe_num_experts=moe_num_experts,
        moe_top_k=moe_top_k,
        moe_capacity_factor=moe_capacity_factor,
        moe_interval=moe_interval,
        ep_axis_name=ep_axis_name,
    )
    return BERTTextEncoder(
        embeddings=embeddings,
        encoder=encoder,
        layernorm=Fp32LayerNorm(eps=layer_norm_eps, param_dtype=param_dtype),
        pooler=Pooler(hidden_size=hidden_size, dtype=dtype, param_dtype=param_dtype),
    )
