"""Multi-instance-learning encoder.

Parity with reference ``modules/encoders/mil_encoder.py:12`` (MILEncoder):
partition the input, run a shared encoder over each partition, deepset-fuse.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.modules.fusions.deepset_fusion import (
    DeepsetFusionModule,
    DeepsetFusionWithTransformer,
)


class MILEncoder(nn.Module):
    partition_sizes: Sequence[int]
    shared_encoder: nn.Module
    shared_encoder_dim: int
    mlp: nn.Module
    pooling_function: Callable = jnp.sum
    apply_attention: bool = False
    attention_dim: Optional[int] = None
    modality_normalize: bool = False
    norm_factor: float = 2.0
    use_auto_mapping: bool = False
    use_transformer_pooling: bool = False

    def get_channel_name(self, idx: int) -> str:
        return f"mil_{idx}"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.shape[1] != sum(self.partition_sizes):
            raise ValueError(
                f"partition sizes should sum to the input size {x.shape[1]}"
            )
        channel_to_dim = {
            self.get_channel_name(i): self.shared_encoder_dim
            for i in range(len(self.partition_sizes))
        }
        fusion_cls = (
            DeepsetFusionWithTransformer
            if self.use_transformer_pooling
            else DeepsetFusionModule
        )
        fusion = fusion_cls(
            channel_to_encoder_dim=channel_to_dim,
            mlp=self.mlp,
            pooling_function=self.pooling_function,
            apply_attention=self.apply_attention,
            attention_dim=self.attention_dim,
            modality_normalize=self.modality_normalize,
            norm_factor=self.norm_factor,
            use_auto_mapping=self.use_auto_mapping,
            name="deepset_fusion",
        )
        encoded = {}
        start = 0
        for i, size in enumerate(self.partition_sizes):
            part = x[:, start : start + size]
            encoded[self.get_channel_name(i)] = self.shared_encoder(part)
            start += size
        return fusion(encoded)
