"""Attention-weighted fusion.

Parity with reference ``modules/fusions/attention_fusion.py:13``
(AttentionFusionModule): learned softmax weights over per-modality linear
projections to a common dim.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class AttentionFusionModule(nn.Module):
    channel_to_encoder_dim: Dict[str, int]
    encoding_projection_dim: Optional[int] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embeddings: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        channels = sorted(self.channel_to_encoder_dim.keys())
        proj_dim = self.encoding_projection_dim
        if proj_dim is None:
            proj_dim = min(self.channel_to_encoder_dim.values())

        concatenated = jnp.concatenate([embeddings[k] for k in channels], axis=-1)
        logits = nn.Dense(
            len(channels), dtype=self.dtype, param_dtype=self.param_dtype,
            name="attention",
        )(concatenated)
        weights = jax.nn.softmax(logits, axis=-1)

        fused = 0.0
        for i, channel in enumerate(channels):
            projected = nn.Dense(
                proj_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"projection_{channel}",
            )(embeddings[channel])
            fused = fused + weights[:, i : i + 1] * projected
        return fused
