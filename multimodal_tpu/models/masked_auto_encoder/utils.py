"""MAE training utilities: LR schedule + layer-decay parameter groups.

Parity with reference ``models/masked_auto_encoder/utils.py``
(CosineWithWarmupAndLRScaling:51, get_param_groups_with_layer_decay:95-170),
re-expressed as an optax schedule + a per-leaf LR-scale pytree consumed by
``scale_updates_by_tree`` — the TPU-native analog of torch param groups
(one fused update, no group loop).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def cosine_with_warmup(
    base_lr: float, warmup_steps: int, total_steps: int, min_lr: float = 0.0
) -> optax.Schedule:
    """Linear warmup then cosine decay (reference utils.py:51)."""

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = base_lr * count / jnp.maximum(warmup_steps, 1)
        progress = (count - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
        progress = jnp.clip(progress, 0.0, 1.0)
        cos = min_lr + (base_lr - min_lr) * 0.5 * (1 + jnp.cos(math.pi * progress))
        return jnp.where(count < warmup_steps, warm, cos)

    return schedule


def mae_layer_id(path: str, num_layers: int) -> int:
    """Map a param path to its depth id: embeddings -> 0, encoder layer i ->
    i+1, everything else (head, decoder) -> num_layers + 1."""
    if "embeddings" in path or "cls_token" in path or "position_embeddings" in path:
        return 0
    if "layer_" in path:
        try:
            idx = int(path.split("layer_")[1].split("/")[0].split(".")[0])
            return idx + 1
        except (ValueError, IndexError):
            pass
    return num_layers + 1


def layer_decay_scales(
    params: Any,
    layer_decay: float,
    num_layers: int,
    layer_id_fn: Callable[[str, int], int] = mae_layer_id,
) -> Any:
    """Per-leaf LR multipliers: ``layer_decay ** (num_layers + 1 - layer_id)``
    (reference utils.py:95-170 semantics)."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    scales = []
    for path, leaf in flat:
        path_str = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        lid = layer_id_fn(path_str, num_layers)
        scales.append(layer_decay ** (num_layers + 1 - lid))
    return jax.tree_util.tree_unflatten(treedef, scales)


def scale_updates_by_tree(scales: Any) -> optax.GradientTransformation:
    """optax transform multiplying each update leaf by its scale."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree_util.tree_map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)


def mae_optimizer(
    params: Any,
    base_lr: float = 1.5e-4,
    warmup_steps: int = 1000,
    total_steps: int = 100_000,
    weight_decay: float = 0.05,
    layer_decay: Optional[float] = None,
    num_layers: int = 12,
    b1: float = 0.9,
    b2: float = 0.95,
) -> optax.GradientTransformation:
    """AdamW + cosine-warmup (+ optional layer-decay scaling) in one chain."""
    schedule = cosine_with_warmup(base_lr, warmup_steps, total_steps)
    chain = [optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay)]
    if layer_decay is not None:
        chain.append(scale_updates_by_tree(layer_decay_scales(params, layer_decay, num_layers)))
    return optax.chain(*chain)
