"""Video VQ-VAE encoder/decoder (3-D convs + axial attention).

Parity with reference ``models/video_gpt/video_vqvae.py`` (AxialAttention
lives in ``modules/layers/attention``; AttentionResidualBlock:406,
VideoEncoder:215, VideoDecoder:318, video_vqvae:140). NDHWC layout
``(b, t, h, w, c)``; BatchNorm runs through flax's batch_stats collection.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.models.vqvae import VQVAE
from multimodal_tpu.modules.layers.attention import AxialAttention, MultiHeadAttention
from multimodal_tpu.modules.layers.conv import SamePadConv3d, SamePadConvTranspose3d
from multimodal_tpu.utils.common import to_tuple_tuple


class AxialAttentionBlock(nn.Module):
    """Sum of per-axis multihead axial attention (reference :85)."""

    n_dims: int
    qkv_dim: int
    n_head: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: channel-last (b, d1..dn, c)."""
        if x.shape[-1] != self.qkv_dim:
            raise ValueError(
                f"Input channel dimension is {x.shape[-1]}, expected {self.qkv_dim}"
            )
        out = jnp.zeros_like(x)
        for d in range(self.n_dims):
            out = out + MultiHeadAttention(
                dim_q=self.qkv_dim,
                dim_kv=self.qkv_dim,
                n_head=self.n_head,
                attn_module=AxialAttention(axial_dim=d),
                add_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"mha_attn_{d}",
            )(x)
        return out


class AttentionResidualBlock(nn.Module):
    """BN/ReLU conv bottleneck + axial attention with residual (reference :406)."""

    hidden_dim: int = 240
    n_head: int = 2
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.hidden_dim < 2:
            raise ValueError("hidden dim must be at least 2")
        bn = lambda name: nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, param_dtype=self.param_dtype, name=name,
        )
        h = jax.nn.relu(bn("bn_1")(x.astype(jnp.float32)).astype(x.dtype))
        h = SamePadConv3d(self.hidden_dim // 2, 3, use_bias=False,
                          dtype=self.dtype, param_dtype=self.param_dtype, name="conv_1")(h)
        h = jax.nn.relu(bn("bn_2")(h.astype(jnp.float32)).astype(h.dtype))
        h = SamePadConv3d(self.hidden_dim, 1, use_bias=False,
                          dtype=self.dtype, param_dtype=self.param_dtype, name="conv_2")(h)
        h = jax.nn.relu(bn("bn_3")(h.astype(jnp.float32)).astype(h.dtype))
        h = AxialAttentionBlock(3, self.hidden_dim, self.n_head,
                                dtype=self.dtype, param_dtype=self.param_dtype,
                                name="attn_block")(h)
        return x + h


class VideoEncoder(nn.Module):
    """Strided SamePad 3-D conv stack -> attention-residual stack -> 1x1 conv."""

    in_channel_dims: Tuple[int, ...]
    kernel_sizes: Tuple[Tuple[int, int, int], ...]
    strides: Tuple[Tuple[int, int, int], ...]
    output_dim: int
    n_res_layers: int = 4
    attn_hidden_dim: int = 240
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def get_latent_shape(self, input_shape: Tuple[int, ...]) -> Tuple[int, ...]:
        latent = list(input_shape)
        for stride in self.strides:
            latent = [d // s for d, s in zip(latent, stride)]
        return tuple(latent)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        n = len(self.in_channel_dims)
        if x.shape[-1] != self.in_channel_dims[0]:
            raise ValueError(
                f"expected input channel dim to be {self.in_channel_dims[0]}, got {x.shape[-1]}"
            )
        h = x
        for i in range(n):
            out_ch = self.in_channel_dims[i + 1] if i < n - 1 else self.attn_hidden_dim
            h = SamePadConv3d(
                out_ch, self.kernel_sizes[i], self.strides[i],
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"conv_{i}",
            )(h)
            if i < n - 1:
                h = jax.nn.relu(h)
        for i in range(self.n_res_layers):
            h = AttentionResidualBlock(
                self.attn_hidden_dim, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"res_{i}",
            )(h, deterministic=deterministic)
        h = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, param_dtype=self.param_dtype, name="bn_out",
        )(h.astype(jnp.float32)).astype(h.dtype)
        h = jax.nn.relu(h)
        return SamePadConv3d(
            self.output_dim, 1, 1, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv_out",
        )(h)


class VideoDecoder(nn.Module):
    """1x1 conv -> attention-residual stack -> transpose-conv upsampling."""

    out_channel_dims: Tuple[int, ...]
    kernel_sizes: Tuple[Tuple[int, int, int], ...]
    strides: Tuple[Tuple[int, int, int], ...]
    input_dim: int
    n_res_layers: int = 4
    attn_hidden_dim: int = 240
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if x.shape[-1] != self.input_dim:
            raise ValueError(
                f"expected input channel dim to be {self.input_dim}, got {x.shape[-1]}"
            )
        h = SamePadConv3d(
            self.attn_hidden_dim, 1, 1, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv_in",
        )(x)
        for i in range(self.n_res_layers):
            h = AttentionResidualBlock(
                self.attn_hidden_dim, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"res_{i}",
            )(h, deterministic=deterministic)
        h = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, param_dtype=self.param_dtype, name="bn_out",
        )(h.astype(jnp.float32)).astype(h.dtype)
        h = jax.nn.relu(h)
        n = len(self.out_channel_dims)
        for i in range(n):
            h = SamePadConvTranspose3d(
                self.out_channel_dims[i], self.kernel_sizes[i], self.strides[i],
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"convt_{i}",
            )(h)
            if i < n - 1:
                h = jax.nn.relu(h)
        return h


def preprocess_int_conv_params(
    channel_dims: Tuple[int, ...],
    kernel_sizes: Optional[Union[int, Tuple]] = None,
    strides: Optional[Union[int, Tuple]] = None,
):
    """int conv params -> tuple-of-3-tuples per layer (reference :451)."""
    if kernel_sizes is None and strides is None:
        raise ValueError("must specify at least one of kernel_sizes or strides")
    n = len(channel_dims)
    k = to_tuple_tuple(kernel_sizes, 3, n) if kernel_sizes is not None else None
    s = to_tuple_tuple(strides, 3, n) if strides is not None else None
    if k is not None and s is not None:
        return k, s
    return k if k is not None else s


def video_vqvae(
    in_channel_dim: int,
    encoder_hidden_dim: int,
    encoder_kernel_size: int,
    encoder_stride: int,
    encoder_n_layers: int,
    n_res_layers: int,
    attn_hidden_dim: int,
    num_embeddings: int,
    embedding_dim: int,
    decoder_hidden_dim: int,
    decoder_kernel_size: int,
    decoder_stride: int,
    decoder_n_layers: int,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
) -> VQVAE:
    """Generic video VQVAE builder (reference video_vqvae.py:140)."""
    encoder_in_channel_dims = (in_channel_dim,) + (encoder_hidden_dim,) * max(
        encoder_n_layers - 1, 0
    )
    decoder_out_channel_dims = (decoder_hidden_dim,) * max(decoder_n_layers - 1, 0) + (
        in_channel_dim,
    )
    enc_k, enc_s = preprocess_int_conv_params(
        encoder_in_channel_dims, encoder_kernel_size, encoder_stride
    )
    dec_k, dec_s = preprocess_int_conv_params(
        decoder_out_channel_dims, decoder_kernel_size, decoder_stride
    )
    encoder = VideoEncoder(
        encoder_in_channel_dims, enc_k, enc_s, embedding_dim,
        n_res_layers, attn_hidden_dim, dtype=dtype, param_dtype=param_dtype,
    )
    decoder = VideoDecoder(
        decoder_out_channel_dims, dec_k, dec_s, embedding_dim,
        n_res_layers, attn_hidden_dim, dtype=dtype, param_dtype=param_dtype,
    )
    return VQVAE(encoder, decoder, num_embeddings, embedding_dim)
