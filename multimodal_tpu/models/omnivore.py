"""Omnivore: one Swin3D trunk, per-dataset heads.

Parity with reference ``models/omnivore.py`` (Omnivore:54,
PatchEmbedOmnivore:86, omnivore_swin_t/s/b:203-260): single encoder over
images/videos/RGBD with head dispatch on ``input_type``; depth channel gets
its own patch embedding added onto the RGB embedding.

Input layout: (b, T, H, W, C) with C = 3 (RGB) or 4 (RGBD); single images
use T = 1.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.encoders.swin_transformer_3d_encoder import (
    PatchEmbed3d,
    SwinTransformer3d,
)


class PatchEmbedOmnivore(nn.Module):
    """RGB patch embed + separate depth-channel embed, summed (reference :86)."""

    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 96
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        rgb = PatchEmbed3d(self.patch_size, self.embed_dim, name="patch_embed", **common)(
            x[..., :3]
        )
        if x.shape[-1] == 4:
            depth = PatchEmbed3d(
                self.patch_size, self.embed_dim, name="depth_patch_embed", **common
            )(x[..., 3:4])
            rgb = rgb + depth
        return rgb


class Omnivore(nn.Module):
    encoder: nn.Module
    heads: Dict[str, nn.Module]

    def __call__(self, x: jnp.ndarray, input_type: str,
                 deterministic: bool = True) -> jnp.ndarray:
        feats = self.encoder(x, deterministic=deterministic)
        if self.is_initializing():
            # materialize every head's params regardless of input_type
            for name, head in self.heads.items():
                if name != input_type:
                    try:
                        head(feats, deterministic=deterministic)
                    except TypeError:
                        head(feats)
        if input_type not in self.heads:
            raise ValueError(
                f"Unsupported input_type: {input_type}, "
                f"please use one of {list(self.heads.keys())}"
            )
        head = self.heads[input_type]
        try:
            return head(feats, deterministic=deterministic)
        except TypeError:
            return head(feats)


class _KineticsHead(nn.Module):
    input_dim: int
    num_classes: int = 400

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        return nn.Dense(self.num_classes)(x)


def _multimodal_heads(input_dim: int) -> Dict[str, nn.Module]:
    return {
        "image": nn.Dense(1000),              # ImageNet-1k
        "video": _KineticsHead(input_dim),    # Kinetics-400 (w/ dropout)
        "rgbd": nn.Dense(19),                 # SUN RGB-D
    }


def _omnivore(
    embed_dim: int,
    depths: Sequence[int],
    num_heads: Sequence[int],
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
) -> Omnivore:
    common = dict(dtype=dtype, param_dtype=param_dtype)
    trunk = SwinTransformer3d(
        patch_size=(2, 4, 4),
        embed_dim=embed_dim,
        depths=tuple(depths),
        num_heads=tuple(num_heads),
        window_size=(8, 7, 7),
        patch_embed=PatchEmbedOmnivore(embed_dim=embed_dim, name="patch_embed", **common),
        **common,
    )
    out_dim = embed_dim * 2 ** (len(depths) - 1)
    return Omnivore(encoder=trunk, heads=_multimodal_heads(out_dim))


def omnivore_swin_t(**kwargs: Any) -> Omnivore:
    return _omnivore(96, (2, 2, 6, 2), (3, 6, 12, 24), **kwargs)


def omnivore_swin_s(**kwargs: Any) -> Omnivore:
    return _omnivore(96, (2, 2, 18, 2), (3, 6, 12, 24), **kwargs)


def omnivore_swin_b(**kwargs: Any) -> Omnivore:
    return _omnivore(128, (2, 2, 18, 2), (4, 8, 16, 32), **kwargs)
