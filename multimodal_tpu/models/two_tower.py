"""Two-tower architecture over late-fusion towers.

Parity with reference ``models/two_tower.py:19`` (TwoTower, TwoTowerOutput):
two towers (optionally shared with channel remapping) + tower fusion.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional

import jax.numpy as jnp
from flax import linen as nn

from multimodal_tpu.models.late_fusion import LateFusion


class TwoTowerOutput(NamedTuple):
    output: jnp.ndarray
    tower_embeddings: Dict[str, jnp.ndarray]


class TwoTower(nn.Module):
    tower_id_to_tower: Dict[str, LateFusion]
    tower_fusion: nn.Module
    shared_tower_id_to_channel_mapping: Optional[Dict[str, Dict[str, str]]] = None

    def __post_init__(self):
        if len(self.tower_id_to_tower) != 2:
            raise ValueError(
                f"Two tower needs 2 towers but found {len(self.tower_id_to_tower)} towers"
            )
        super().__post_init__()

    def _tower_input(
        self,
        tower_id: str,
        tower_channels: List[str],
        channel_to_input: Dict[str, jnp.ndarray],
    ) -> Dict[str, jnp.ndarray]:
        mapping: Dict[str, str] = {}
        if self.shared_tower_id_to_channel_mapping is not None:
            mapping = self.shared_tower_id_to_channel_mapping.get(tower_id, {})
        return {ch: channel_to_input[mapping.get(ch, ch)] for ch in tower_channels}

    def __call__(self, channel_to_input: Dict[str, jnp.ndarray]) -> TwoTowerOutput:
        tower_embeddings = {}
        for tower_id in sorted(self.tower_id_to_tower.keys()):
            tower = self.tower_id_to_tower[tower_id]
            tower_input = self._tower_input(
                tower_id, list(tower.encoders.keys()), channel_to_input
            )
            tower_embeddings[tower_id] = tower(tower_input)
        final_out = self.tower_fusion(list(tower_embeddings.values()))
        return TwoTowerOutput(output=final_out, tower_embeddings=tower_embeddings)
