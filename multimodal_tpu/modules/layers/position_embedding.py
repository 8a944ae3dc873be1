"""Position embeddings.

Parity with reference ``modules/layers/position_embedding.py``
(BroadcastedPositionEmbedding:14, SinusoidalPositionEmbeddings:142).

``BroadcastedPositionEmbedding`` factorizes a 3-D (or n-D) latent volume's
position table into one small table per axis; a flat position id selects and
concatenates one row per axis. TPU-native design: rather than materializing
the full broadcast volume + fancy indexing (reference ``:75-140``), we
decompose flat ids into per-axis coordinates with div/mod (cheap VPU int
ops) and do n small gathers — O(positions · dim) instead of
O(volume · dim) memory.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn


class BroadcastedPositionEmbedding(nn.Module):
    """Factorized per-axis position embeddings for n-D latents (VideoGPT)."""

    latent_shape: Tuple[int, ...]
    embedding_dim: int
    param_dtype: Any = jnp.float32

    def setup(self):
        n_dim = len(self.latent_shape)
        if self.embedding_dim % n_dim != 0:
            raise ValueError(
                f"Embedding dim {self.embedding_dim} modulo len(latent_shape) {n_dim} is not zero"
            )
        self.embeddings = [
            self.param(
                f"d_{i}",
                nn.initializers.normal(stddev=0.01),
                (self.latent_shape[i], self.embedding_dim // n_dim),
                self.param_dtype,
            )
            for i in range(n_dim)
        ]

    @property
    def num_positions(self) -> int:
        return math.prod(self.latent_shape)

    def __call__(self, position_ids: jnp.ndarray) -> jnp.ndarray:
        """position_ids: (batch, n_pos) flat ids into the row-major latent volume.

        Negative ids wrap (matching torch fancy-indexing semantics for -1).
        """
        total = self.num_positions
        flat = position_ids % total  # wrap negatives
        parts = []
        stride = total
        for i, d in enumerate(self.latent_shape):
            stride //= d
            coord = (flat // stride) % d
            parts.append(jnp.take(self.embeddings[i], coord, axis=0))
        return jnp.concatenate(parts, axis=-1)


class SinusoidalPositionEmbeddings(nn.Module):
    """DDPM timestep embeddings (Ho et al. 2020)."""

    embed_dim: int = 128

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half_dim = self.embed_dim // 2
        scale = math.log(10000) / (half_dim - 1)
        freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -scale)
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
        if self.embed_dim % 2 == 1:
            emb = jnp.pad(emb, ((0, 0), (0, 1)))
        return emb
