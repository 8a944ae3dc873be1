"""Fixed sin-cos position embeddings (1-d / 2-d / 3-d grids).

Parity with reference ``models/masked_auto_encoder/position_embeddings.py``
(get_1d:103, get_2d:73, get_3d:13). Pure jnp; computed once at module init
and stored as non-trainable constants.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def get_1d_sin_cos_embeddings(embed_dim: int, positions: jnp.ndarray) -> jnp.ndarray:
    omega = 1.0 / 10000 ** (
        jnp.arange(embed_dim // 2, dtype=jnp.float32) / (embed_dim / 2.0)
    )
    out = jnp.einsum("i,j->ij", positions.astype(jnp.float32), omega)
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)


def get_2d_sin_cos_embeddings(
    embed_dim: int, input_size: Tuple[int, int], include_cls_embed: bool = True
) -> jnp.ndarray:
    """input_size is (w, h) to match the reference's call convention; output
    is ``(1, [1+]h*w, embed_dim)`` in row-major (h, w) order."""
    if embed_dim % 4 != 0:
        raise ValueError(f"embed_dim must be divisible by 4, got {embed_dim}")
    h, w = input_size
    grid_w, grid_h = jnp.meshgrid(jnp.arange(w), jnp.arange(h))  # 'xy' indexing
    embed_w = get_1d_sin_cos_embeddings(embed_dim // 2, grid_w.ravel())
    embed_h = get_1d_sin_cos_embeddings(embed_dim // 2, grid_h.ravel())
    embed = jnp.concatenate([embed_w, embed_h], axis=1)
    if include_cls_embed:
        embed = jnp.concatenate([jnp.zeros((1, embed_dim)), embed], axis=0)
    return embed[None]


def get_3d_sin_cos_embeddings(
    embed_dim: int,
    temporal_size: int,
    spatial_size: Tuple[int, int],
    include_cls_embed: bool = True,
) -> jnp.ndarray:
    """[T, H, W]-ordered embeddings: 1/4 of dims temporal, 3/4 spatial."""
    if embed_dim % 4 != 0:
        raise ValueError(f"embed_dim must be divisible by 4, got {embed_dim}")
    embed_dim_spatial = embed_dim // 4 * 3
    embed_dim_temporal = embed_dim // 4

    h, w = spatial_size
    grid_w, grid_h = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    embed_w = get_1d_sin_cos_embeddings(embed_dim_spatial // 2, grid_w.ravel())
    embed_h = get_1d_sin_cos_embeddings(embed_dim_spatial // 2, grid_h.ravel())
    embed_spatial = jnp.concatenate([embed_w, embed_h], axis=1)  # (h*w, 3d/4)

    embed_temporal = get_1d_sin_cos_embeddings(
        embed_dim_temporal, jnp.arange(temporal_size)
    )  # (t, d/4)

    embed_temporal = jnp.repeat(embed_temporal[:, None, :], h * w, axis=1)
    embed_spatial = jnp.repeat(embed_spatial[None, :, :], temporal_size, axis=0)
    embed = jnp.concatenate([embed_temporal, embed_spatial], axis=-1).reshape(-1, embed_dim)
    if include_cls_embed:
        embed = jnp.concatenate([jnp.zeros((1, embed_dim)), embed], axis=0)
    return embed[None]
