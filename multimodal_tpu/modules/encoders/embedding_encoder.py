"""Bag-of-embeddings encoders.

Parity with reference ``modules/encoders/embedding_encoder.py:13``
(EmbeddingEncoder) and ``weighted_embedding_encoder.py:13``
(WeightedEmbeddingEncoder).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

POOLING_TYPES = ("sum", "mean", "max")


class EmbeddingEncoder(nn.Module):
    num_embeddings: int
    embedding_dim: int
    pooling_type: str = "sum"
    pooling_dim: int = 1
    use_hash: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.pooling_type not in POOLING_TYPES:
            raise ValueError(
                f"pooling type should be in {POOLING_TYPES}, found {self.pooling_type}"
            )
        if self.use_hash:
            x = x % (self.num_embeddings - 1) + 1
        out = nn.Embed(
            self.num_embeddings, self.embedding_dim,
            dtype=self.dtype, param_dtype=self.param_dtype, name="embedding",
        )(x)
        if self.pooling_type == "sum":
            return jnp.sum(out, axis=self.pooling_dim)
        if self.pooling_type == "mean":
            return jnp.mean(out, axis=self.pooling_dim)
        return jnp.max(out, axis=self.pooling_dim)


class WeightedEmbeddingEncoder(nn.Module):
    """Weighted bag of embeddings: per-category weights scale the embedding
    table rows, then pool."""

    num_embeddings: int
    embedding_dim: int
    pooling_function: Callable = jnp.sum  # called as f(x, axis=...)
    pooling_dim: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, weights: jnp.ndarray) -> jnp.ndarray:
        index = jnp.arange(weights.shape[1])
        table = nn.Embed(
            self.num_embeddings, self.embedding_dim,
            dtype=self.dtype, param_dtype=self.param_dtype, name="embedding",
        )(index)
        weighted = table[None] * weights[..., None]
        pooled = self.pooling_function(weighted, axis=self.pooling_dim)
        if isinstance(pooled, tuple):
            pooled = pooled[0]
        return pooled
