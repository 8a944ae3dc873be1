"""VideoGPT model builders.

Parity with reference ``models/video_gpt/model.py`` (video_gpt:25,
video_vqvae:112).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp

from multimodal_tpu.models.video_gpt.gpt import (
    MultimodalGPT,
    MultimodalTransformerDecoder,
    RightShift,
    TransformerDecoder,
)
from multimodal_tpu.models.video_gpt import video_vqvae as vv
from multimodal_tpu.models.vqvae import VQVAE
from multimodal_tpu.modules.layers.position_embedding import (
    BroadcastedPositionEmbedding,
)


def video_vqvae(
    conv_filter_sizes: Tuple[Tuple[int, int, int], ...] = ((4, 4, 4),),
    conv_filter_strides: Tuple[Tuple[int, int, int], ...] = ((2, 2, 2),),
    encoder_filter_size: Tuple[int, int, int] = (3, 3, 3),
    encoder_filter_stride: Tuple[int, int, int] = (1, 1, 1),
    in_channel_dim: int = 3,
    encoder_hidden_dim: int = 240,
    n_res_layers: int = 4,
    attn_hidden_dim: int = 240,
    num_embeddings: int = 1024,
    embedding_dim: int = 256,
    decoder_hidden_dim: int = 240,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
) -> VQVAE:
    """VideoGPT's video VQVAE (reference model.py:112)."""
    encoder_kernel_sizes = conv_filter_sizes + (encoder_filter_size,)
    encoder_strides = conv_filter_strides + (encoder_filter_stride,)
    encoder_n_layers = len(encoder_strides)
    decoder_n_layers = len(conv_filter_strides)

    encoder_in_channel_dims = (in_channel_dim,) + (encoder_hidden_dim,) * max(
        encoder_n_layers - 1, 0
    )
    decoder_out_channel_dims = (decoder_hidden_dim,) * max(decoder_n_layers - 1, 0) + (
        in_channel_dim,
    )
    encoder = vv.VideoEncoder(
        encoder_in_channel_dims, encoder_kernel_sizes, encoder_strides,
        embedding_dim, n_res_layers, attn_hidden_dim,
        dtype=dtype, param_dtype=param_dtype,
    )
    decoder = vv.VideoDecoder(
        decoder_out_channel_dims, conv_filter_sizes, conv_filter_strides,
        embedding_dim, n_res_layers, attn_hidden_dim,
        dtype=dtype, param_dtype=param_dtype,
    )
    return VQVAE(encoder, decoder, num_embeddings, embedding_dim)


def video_gpt(
    input_shape: Tuple[int, int, int] = (16, 64, 64),
    latent_shape: Tuple[int, int, int] = (8, 32, 32),
    d_model: int = 576,
    n_head: int = 4,
    dropout: float = 0.2,
    attn_dropout: float = 0.3,
    num_decoder_layers: int = 16,
    vqvae_kwargs: dict = None,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
) -> MultimodalGPT:
    """VideoGPT (reference model.py:25): video->video generation with a
    shared-architecture VQVAE tokenizer for both modalities."""
    vqvae_kwargs = vqvae_kwargs or {}
    in_tokenizer = video_vqvae(dtype=dtype, param_dtype=param_dtype, **vqvae_kwargs)
    out_tokenizer = video_vqvae(dtype=dtype, param_dtype=param_dtype, **vqvae_kwargs)
    num_in_tokens = in_tokenizer.num_embeddings
    num_out_tokens = out_tokenizer.num_embeddings

    vqvae_latent_shape = in_tokenizer.encoder.get_latent_shape(input_shape)
    if tuple(latent_shape) != tuple(vqvae_latent_shape):
        raise ValueError(
            f"Latent shape required: {latent_shape} does not match that of VQVAE: {vqvae_latent_shape}"
        )

    in_pos_emb = BroadcastedPositionEmbedding(tuple(latent_shape), d_model, param_dtype=param_dtype)
    out_pos_emb = BroadcastedPositionEmbedding(tuple(latent_shape), d_model, param_dtype=param_dtype)
    decoder = TransformerDecoder(
        num_layers=num_decoder_layers, d_model=d_model, n_head=n_head,
        dropout=dropout, attn_dropout=attn_dropout,
        dtype=dtype, param_dtype=param_dtype,
    )
    mm_decoder = MultimodalTransformerDecoder(
        in_pos_emb, out_pos_emb, decoder, RightShift(d_model, param_dtype=param_dtype)
    )
    return MultimodalGPT(
        d_model=d_model,
        num_in_tokens=num_in_tokens,
        num_out_tokens=num_out_tokens,
        latent_shape=tuple(latent_shape),
        in_tokenizer=in_tokenizer,
        out_tokenizer=out_tokenizer,
        mm_decoder=mm_decoder,
        dtype=dtype,
        param_dtype=param_dtype,
    )
