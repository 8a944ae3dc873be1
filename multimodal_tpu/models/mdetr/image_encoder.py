"""MDETR image backbone: ResNet-101 with frozen batchnorm + sine pos embed.

Parity with reference ``models/mdetr/image_encoder.py``
(FrozenBatchNorm2d:17, PositionEmbedding2D:54, MaskedIntermediateLayer:110,
mdetr_resnet101_backbone). NHWC layout; the frozen BN folds into a
per-channel scale/bias (constant under stop_gradient).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm2d(nn.Module):
    """BN with fixed statistics and affine params (never trained)."""

    features: int
    eps: float = 1e-5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,), self.param_dtype)
        var = self.param("running_var", nn.initializers.ones, (self.features,), self.param_dtype)
        weight, bias, mean, var = map(jax.lax.stop_gradient, (weight, bias, mean, var))
        scale = weight * jax.lax.rsqrt(var + self.eps)
        return x * scale + (bias - mean * scale)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        out_ch = self.planes * 4
        h = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1", **common)(x)
        h = jax.nn.relu(FrozenBatchNorm2d(self.planes, name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv2", **common)(h)
        h = jax.nn.relu(FrozenBatchNorm2d(self.planes, name="bn2")(h))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3", **common)(h)
        h = FrozenBatchNorm2d(out_ch, name="bn3")(h)
        if self.downsample:
            x = nn.Conv(out_ch, (1, 1), strides=self.stride, use_bias=False,
                        name="downsample_conv", **common)(x)
            x = FrozenBatchNorm2d(out_ch, name="downsample_bn")(x)
        return jax.nn.relu(x + h)


class ResNetBackbone(nn.Module):
    """ResNet trunk up to layer4 (no pooling), frozen-BN everywhere."""

    layers: Sequence[int] = (3, 4, 23, 3)  # ResNet-101
    width: int = 64
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.Conv(self.width, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1", **common)(x)
        h = jax.nn.relu(FrozenBatchNorm2d(self.width, name="bn1")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        planes = self.width
        for li, blocks in enumerate(self.layers):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                h = Bottleneck(
                    planes, stride=stride if bi == 0 else 1,
                    downsample=(bi == 0), name=f"layer{li + 1}_{bi}", **common,
                )(h)
            planes *= 2
        return h  # (b, H/32, W/32, 2048)


class MaskedIntermediateLayer(nn.Module):
    """Backbone features + padding mask resized to feature resolution
    (reference :110)."""

    backbone: nn.Module

    def __call__(self, images: jnp.ndarray, image_mask: jnp.ndarray):
        feats = self.backbone(images)
        b, fh, fw, _ = feats.shape
        # nearest-resize the boolean mask to the feature grid
        mask = jax.image.resize(
            image_mask.astype(jnp.float32)[..., None], (b, fh, fw, 1), "nearest"
        )[..., 0].astype(bool)
        return feats, mask


def position_embedding_2d(
    mask: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature: int = 10000,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Sine 2-D position embeddings from a padding mask (reference :54).

    mask: (b, h, w) True = PADDED. Returns (b, h, w, 2*num_pos_feats).
    """
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if scale is not None:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1)
    pos_x = pos_x.reshape(pos_x.shape[:3] + (-1,))
    pos_y = pos_y.reshape(pos_y.shape[:3] + (-1,))
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def mdetr_resnet101_backbone(dtype=jnp.float32, param_dtype=jnp.float32) -> MaskedIntermediateLayer:
    return MaskedIntermediateLayer(
        ResNetBackbone(layers=(3, 4, 23, 3), dtype=dtype, param_dtype=param_dtype)
    )
