"""Learned-query attention pooling (CoCa).

Parity with reference ``modules/layers/attention_pooler.py``
(AttentionPooler:16, CascadedAttentionPooler:71).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.layers.multi_head_attention import MultiHeadAttentionWithCache


class AttentionPooler(nn.Module):
    """Pool a sequence to ``n_queries`` tokens by cross-attending learned queries."""

    input_embed_dim: int
    output_embed_dim: int
    n_head: int
    n_queries: int = 256
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        query = self.param(
            "query", nn.initializers.normal(stddev=1.0),
            (self.n_queries, self.output_embed_dim), self.param_dtype,
        )
        ln = lambda name: nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=jnp.float32,
            param_dtype=self.param_dtype, name=name,
        )
        x = ln("ln_k")(x.astype(jnp.float32)).astype(self.dtype)
        q = ln("ln_q")(query.astype(jnp.float32)).astype(self.dtype)
        q = jnp.broadcast_to(q[None], (x.shape[0],) + q.shape)
        out = MultiHeadAttentionWithCache(
            dim_q=self.output_embed_dim, dim_kv=self.input_embed_dim,
            num_heads=self.n_head, dtype=self.dtype, param_dtype=self.param_dtype,
            name="attn",
        )(q, x, x)
        return ln("ln_post")(out.astype(jnp.float32)).astype(self.dtype)


class CascadedAttentionPooler(nn.Module):
    """Apply poolers in sequence, returning each stage's output."""

    poolers: Sequence[AttentionPooler]

    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        outs = []
        for pooler in self.poolers:
            x = pooler(x)
            outs.append(x)
        return outs
