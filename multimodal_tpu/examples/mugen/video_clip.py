"""MUGEN retrieval: VideoCLIP (S3D video tower + BERT text tower).

Parity with reference ``examples/mugen/retrieval/video_clip.py``
(TextEncoder, VideoEncoder wrapping torchvision S3D, Projection:99,
videoclip:137-219): S3D with separable 3-D convs and inception blocks,
DistilBERT-config text encoder, 256-d projection heads into the generic
CLIP contrastive wrapper. NDHWC video layout.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.models.clip.model import CLIP
from multimodal_tpu.modules.encoders.bert_text_encoder import bert_text_encoder


class SepConv3d(nn.Module):
    """Separable 3-D conv: spatial (1,k,k) then temporal (k,1,1) (S3D)."""

    out_channels: int
    kernel_size: int = 3
    stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bn = lambda name: nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, epsilon=1e-3,
            dtype=jnp.float32, param_dtype=self.param_dtype, name=name,
        )
        k = self.kernel_size
        st, sh, sw = self.stride
        h = nn.Conv(self.out_channels, (1, k, k), strides=(1, sh, sw),
                    padding=(0, k // 2, k // 2), use_bias=False, name="conv_s",
                    **common)(x)
        h = jax.nn.relu(bn("bn_s")(h.astype(jnp.float32)).astype(h.dtype))
        h = nn.Conv(self.out_channels, (k, 1, 1), strides=(st, 1, 1),
                    padding=(k // 2, 0, 0), use_bias=False, name="conv_t",
                    **common)(h)
        return jax.nn.relu(bn("bn_t")(h.astype(jnp.float32)).astype(h.dtype))


class BasicConv3d(nn.Module):
    out_channels: int
    kernel_size: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Conv(self.out_channels, self.kernel_size, strides=self.stride,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv")(x)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-3, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="bn")(
            h.astype(jnp.float32)
        ).astype(h.dtype)
        return jax.nn.relu(h)


class InceptionBlock3d(nn.Module):
    """S3D inception block: 1x1 | 1x1->sep3 | 1x1->sep3 | pool->1x1."""

    b0: int
    b1a: int
    b1b: int
    b2a: int
    b2b: int
    b3: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        p0 = BasicConv3d(self.b0, name="branch0", **common)(x, deterministic)
        p1 = BasicConv3d(self.b1a, name="branch1a", **common)(x, deterministic)
        p1 = SepConv3d(self.b1b, 3, name="branch1b", **common)(p1, deterministic)
        p2 = BasicConv3d(self.b2a, name="branch2a", **common)(x, deterministic)
        p2 = SepConv3d(self.b2b, 3, name="branch2b", **common)(p2, deterministic)
        p3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding="SAME")
        p3 = BasicConv3d(self.b3, name="branch3", **common)(p3, deterministic)
        return jnp.concatenate([p0, p1, p2, p3], axis=-1)


class S3D(nn.Module):
    """Compact S3D trunk (Xie et al. 2018) ending in global average pooling."""

    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: (b, T, H, W, 3) -> (b, 1024)."""
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = SepConv3d(64, 7, stride=(2, 2, 2), name="stem", **common)(x, deterministic)
        h = nn.max_pool(h, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        h = BasicConv3d(64, name="conv2a", **common)(h, deterministic)
        h = SepConv3d(192, 3, name="conv2b", **common)(h, deterministic)
        h = nn.max_pool(h, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        h = InceptionBlock3d(64, 96, 128, 16, 32, 32, name="mixed3b", **common)(h, deterministic)
        h = InceptionBlock3d(128, 128, 192, 32, 96, 64, name="mixed3c", **common)(h, deterministic)
        h = nn.max_pool(h, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        h = InceptionBlock3d(192, 96, 208, 16, 48, 64, name="mixed4b", **common)(h, deterministic)
        h = InceptionBlock3d(160, 112, 224, 24, 64, 64, name="mixed4c", **common)(h, deterministic)
        h = InceptionBlock3d(128, 128, 256, 24, 64, 64, name="mixed4d", **common)(h, deterministic)
        h = InceptionBlock3d(112, 144, 288, 32, 64, 64, name="mixed4e", **common)(h, deterministic)
        h = InceptionBlock3d(256, 160, 320, 32, 128, 128, name="mixed4f", **common)(h, deterministic)
        h = nn.max_pool(h, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        h = InceptionBlock3d(256, 160, 320, 32, 128, 128, name="mixed5b", **common)(h, deterministic)
        h = InceptionBlock3d(384, 192, 384, 48, 128, 128, name="mixed5c", **common)(h, deterministic)
        return jnp.mean(h, axis=(1, 2, 3))  # (b, 1024)


class Projection(nn.Module):
    """2-layer projection head with residual + LN (reference :99)."""

    out_dim: int = 256
    dropout: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        projected = nn.Dense(self.out_dim, use_bias=False, name="linear1", **common)(x)
        h = jax.nn.gelu(projected)
        h = nn.Dense(self.out_dim, use_bias=False, name="linear2", **common)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = h + projected
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            param_dtype=self.param_dtype, name="ln")(
            h.astype(jnp.float32)
        ).astype(h.dtype)


class VideoEncoder(nn.Module):
    """S3D + projection (reference VideoEncoder)."""

    proj_out: int = 256
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, video: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        feats = S3D(dtype=self.dtype, param_dtype=self.param_dtype, name="s3d")(
            video, deterministic
        )
        return Projection(self.proj_out, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="projection")(
            feats, deterministic
        )


class TextEncoder(nn.Module):
    """DistilBERT-config text tower + projection (reference TextEncoder)."""

    proj_out: int = 256
    vocab_size: int = 30522
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.encoder = bert_text_encoder(
            hidden_size=768, num_hidden_layers=6, num_attention_heads=12,
            intermediate_size=3072, vocab_size=self.vocab_size,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        self.projection = Projection(
            self.proj_out, dtype=self.dtype, param_dtype=self.param_dtype
        )

    def __call__(self, input_ids: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        out = self.encoder(input_ids=input_ids, deterministic=deterministic)
        return self.projection(out.last_hidden_state[:, 0], deterministic)


def videoclip(
    video_proj_out: int = 256,
    text_proj_out: int = 256,
    vocab_size: int = 30522,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
) -> CLIP:
    """S3D-video x BERT-text CLIP (reference video_clip.py:137-219)."""
    return CLIP(
        encoder_a=VideoEncoder(video_proj_out, dtype=dtype, param_dtype=param_dtype),
        encoder_b=TextEncoder(text_proj_out, vocab_size, dtype=dtype, param_dtype=param_dtype),
    )
