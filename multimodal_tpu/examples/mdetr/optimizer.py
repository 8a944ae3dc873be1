"""MDETR per-submodule optimizer and LR schedules.

TPU-native equivalent of the reference's three-param-group AdamW + hand-rolled
schedule stepping (``examples/mdetr/optimizer.py:35-131``): instead of mutating
``param_group["lr"]`` in a host loop each step, the group split is an
``optax.multi_transform`` over param-path labels and each schedule is a pure
``step -> lr`` function compiled into the update, so the whole optimizer stays
inside the jitted train step.
"""

from __future__ import annotations

from bisect import bisect_right
from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax


def mdetr_param_labels(params: Any) -> Any:
    """Label each leaf 'backbone' / 'text_encoder' / 'rest' by its path.

    Mirrors the reference's named_parameters substring split
    (``optimizer.py:102-127``).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)

    def label(path) -> str:
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(str(k) for k in keys)
        if "backbone" in joined:
            return "backbone"
        if "text_encoder" in joined:
            return "text_encoder"
        return "rest"

    return jax.tree_util.tree_unflatten(treedef, [label(path) for path, _ in flat])


class MDETRSchedules(NamedTuple):
    rest: Callable[[int], float]          # transformer + heads ("lr")
    backbone: Callable[[int], float]      # "lr_backbone"
    text_encoder: Callable[[int], float]  # "text_encoder_lr"


def mdetr_lr_schedules(
    schedule: str,
    lr: float,
    lr_backbone: float,
    text_encoder_lr: float,
    num_training_steps: int,
    steps_per_epoch: int,
    lr_drop: int,
    epochs: int,
    fraction_warmup_steps: float = 0.01,
) -> MDETRSchedules:
    """Build per-group step->lr functions for the 4 reference schedules.

    Semantics match ``adjust_learning_rate`` (``optimizer.py:35-99``):
      - ``step``: every lr multiplied by ``0.1 ** (epoch // lr_drop)``
      - ``multistep``: halved at ``lr_drop`` then every 50 epochs
      - ``linear_with_warmup``: step decay for backbone+transformer; the text
        encoder warms up linearly then decays linearly to 0
      - ``all_linear_with_warmup``: linear warmup+decay for all groups
    """
    num_warmup = round(fraction_warmup_steps * num_training_steps)
    milestones = list(range(lr_drop, epochs, 50))

    def step_gamma(step):
        epoch = jnp.asarray(step) // steps_per_epoch
        return 0.1 ** (epoch // lr_drop).astype(jnp.float32)

    def multistep_gamma(step):
        epoch = jnp.asarray(step) // steps_per_epoch
        # bisect_right(milestones, epoch) as a vectorized comparison
        n = sum((epoch >= m).astype(jnp.float32) for m in milestones) if milestones else 0.0
        return 0.5 ** n

    def linear_gamma(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, num_warmup)
        decay = jnp.maximum(
            0.0,
            (num_training_steps - step) / max(1, num_training_steps - num_warmup),
        )
        return jnp.where(step < num_warmup, warm, decay)

    if schedule == "step":
        g = tg = step_gamma
    elif schedule == "multistep":
        g = tg = multistep_gamma
    elif schedule == "linear_with_warmup":
        g, tg = step_gamma, linear_gamma
    elif schedule == "all_linear_with_warmup":
        g = tg = linear_gamma
    else:
        raise NotImplementedError(f"unknown schedule {schedule}")

    return MDETRSchedules(
        rest=lambda step: lr * g(step),
        backbone=lambda step: lr_backbone * g(step),
        text_encoder=lambda step: text_encoder_lr * tg(step),
    )


def build_mdetr_optimizer(
    params: Any,
    schedules: MDETRSchedules,
    weight_decay: float = 1e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AdamW with per-submodule scheduled LRs (ref ``optimizer.py:102-131``)."""

    def group(sched):
        return optax.chain(
            optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_schedule(lambda s: -sched(s)),
        )

    transforms: Dict[str, optax.GradientTransformation] = {
        "rest": group(schedules.rest),
        "backbone": group(schedules.backbone),
        "text_encoder": group(schedules.text_encoder),
    }
    return optax.multi_transform(transforms, mdetr_param_labels(params))
