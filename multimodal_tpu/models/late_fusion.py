"""Generic late-fusion architecture.

Parity with reference ``models/late_fusion.py:13`` (LateFusion): per-modality
encoders -> fusion module -> head.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn


class LateFusion(nn.Module):
    encoders: Dict[str, nn.Module]
    fusion_module: nn.Module
    head_module: nn.Module

    def __call__(self, modalities: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        embeddings = {}
        for key in sorted(self.encoders.keys()):
            if key not in modalities:
                raise KeyError(f"{key} missing in input")
            embeddings[key] = self.encoders[key](modalities[key])
        fused = self.fusion_module(embeddings)
        return self.head_module(fused)
