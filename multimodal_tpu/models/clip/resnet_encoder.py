"""CLIP's modified ResNet image encoder.

Parity with reference ``models/clip/image_encoder.py:116-339``
(ResNetForCLIPBottleneck:116, AttentionPool2d:177, ResNetForCLIP:228):
3-conv stem with avgpool, anti-aliased strided bottlenecks (avgpool before
stride-2 conv), QKV attention pooling with a CLS = mean token, zero-init of
each block's bn3 scale. NHWC; BatchNorm uses flax batch_stats (training
steps pass ``mutable=["batch_stats"]`` with ``deterministic=False``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.ops.attention import scaled_dot_product_attention

EXPANSION = 4


class ResNetForCLIPBottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bn = lambda name, zero_init=False: nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
            scale_init=nn.initializers.zeros if zero_init else nn.initializers.ones,
            dtype=jnp.float32, param_dtype=self.param_dtype, name=name,
        )
        inplanes = x.shape[-1]
        out = jax.nn.relu(bn("bn1")(
            nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1", **common)(x)
            .astype(jnp.float32)).astype(x.dtype))
        out = jax.nn.relu(bn("bn2")(
            nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2", **common)(out)
            .astype(jnp.float32)).astype(x.dtype))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride,) * 2, strides=(self.stride,) * 2)
        out = bn("bn3", zero_init=True)(
            nn.Conv(self.planes * EXPANSION, (1, 1), use_bias=False, name="conv3", **common)(out)
            .astype(jnp.float32)).astype(x.dtype)

        identity = x
        if self.stride > 1 or inplanes != self.planes * EXPANSION:
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride,) * 2, strides=(self.stride,) * 2)
            identity = nn.Conv(
                self.planes * EXPANSION, (1, 1), use_bias=False,
                name="downsample_conv", **common,
            )(identity)
            identity = bn("downsample_bn")(identity.astype(jnp.float32)).astype(x.dtype)
        return jax.nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pooling over spatial features + mean token (reference :177)."""

    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: Optional[int] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (b, h, w, c) -> (b, output_dim)."""
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.embed_dim ** -0.5),
            (self.spacial_dim ** 2 + 1, self.embed_dim),
            self.param_dtype,
        )
        tokens = tokens + pos.astype(tokens.dtype)

        std = (self.output_dim or self.embed_dim) ** -0.5
        dense = lambda d, name: nn.Dense(
            d, kernel_init=nn.initializers.normal(std),
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        hd = self.embed_dim // self.num_heads
        heads = lambda t: t.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        q = heads(dense(self.embed_dim, "q_proj")(tokens))
        k = heads(dense(self.embed_dim, "k_proj")(tokens))
        v = heads(dense(self.embed_dim, "v_proj")(tokens))
        attn = scaled_dot_product_attention(q, k, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, -1, self.embed_dim)
        out = dense(self.output_dim or self.embed_dim, "c_proj")(attn)
        return out[:, 0]


class ResNetForCLIP(nn.Module):
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    output_dim: int = 512
    heads: int = 1024
    input_resolution: int = 224
    width: int = 64
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bn = lambda name: nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, param_dtype=self.param_dtype, name=name,
        )
        # 3-conv stem
        h = jax.nn.relu(bn("bn1")(
            nn.Conv(self.width // 2, (3, 3), strides=2, padding=1, use_bias=False,
                    name="conv1", **common)(x).astype(jnp.float32)).astype(x.dtype))
        h = jax.nn.relu(bn("bn2")(
            nn.Conv(self.width // 2, (3, 3), padding=1, use_bias=False,
                    name="conv2", **common)(h).astype(jnp.float32)).astype(x.dtype))
        h = jax.nn.relu(bn("bn3")(
            nn.Conv(self.width, (3, 3), padding=1, use_bias=False,
                    name="conv3", **common)(h).astype(jnp.float32)).astype(x.dtype))
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))

        for li, blocks in enumerate(self.layers):
            planes = self.width * 2 ** li
            for bi in range(blocks):
                h = ResNetForCLIPBottleneck(
                    planes, stride=(2 if (bi == 0 and li > 0) else 1),
                    name=f"layer{li + 1}_{bi}", **common,
                )(h, deterministic=deterministic)

        return AttentionPool2d(
            self.input_resolution // 32, self.width * 32, self.heads,
            self.output_dim, name="attnpool", **common,
        )(h)
