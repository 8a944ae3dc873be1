"""Concatenation fusion.

Parity with reference ``modules/fusions/concat_fusion.py:13``
(ConcatFusionModule): concat modality embeddings sorted by key, optional
projection.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn


class ConcatFusionModule(nn.Module):
    projection: Optional[nn.Module] = None

    def __call__(self, embeddings: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        out = jnp.concatenate(
            [embeddings[k] for k in sorted(embeddings.keys())], axis=-1
        )
        if self.projection is not None:
            out = self.projection(out)
        return out
