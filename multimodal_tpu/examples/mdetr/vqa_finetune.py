"""MDETR VQA (GQA) fine-tuning recipe + evaluation protocol.

Parity with reference ``examples/mdetr/vqa_finetune.py`` (train_one_epoch)
and ``examples/mdetr/vqa_eval.py`` (evaluate): the full objective is the
detection loss (Hungarian match -> soft-token + L1/GIoU boxes) plus the six
GQA answer-head cross-entropies gated by answer-type masks, optimized with
the per-submodule LR schedule (backbone / text encoder / rest) and optional
EMA of parameters. TPU-native shape: one jitted GSPMD train step through the
generic ``Trainer`` instead of the reference's DDP epoch loop — the Hungarian
assignment runs as a host callback inside jit (losses/mdetr.py:91).

Batch format (static shapes, from the host datamodule):
  images (b, H, W, 3) float; image_mask (b, H, W) bool (True = padding);
  text (b, T) int; text_attention_mask (b, T) bool (True = real tokens);
  positive_map (b, max_boxes, num_classes+1); target_boxes (b, max_boxes, 4)
  cxcywh; valid (b, max_boxes) bool; answers[k] (b,) int per head;
  answer_type_mask[k] (b,) bool per head.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_tpu.examples.mdetr.optimizer import (
    build_mdetr_optimizer,
    mdetr_lr_schedules,
)
from multimodal_tpu.modules.losses.mdetr import (
    build_weight_dict,
    masked_dict_accuracy,
    masked_dict_cross_entropy,
    mdetr_loss,
)
from multimodal_tpu.training.ema import init_ema, update_ema


def vqa_loss_fn(
    model,
    weight_dict: Optional[Dict[str, float]] = None,
) -> Callable:
    """Build the Trainer-compatible ``(params, batch, rng) -> (loss, aux)``.

    Reference: loss assembly at ``vqa_finetune.py:87-104`` — detection terms
    weighted by the weight dict plus the qa-head CEs.
    """
    weights = weight_dict or build_weight_dict(
        vqa_keys=("answer_type", "answer_obj", "answer_rel", "answer_attr",
                  "answer_cat", "answer_global"),
        include_contrastive_loss=False,
    )

    def loss_fn(params, batch, rng):
        out = model.apply(
            params,
            batch["images"],
            batch["image_mask"],
            batch["text"],
            batch["text_attention_mask"],
        )
        det = mdetr_loss(
            out.model_output.pred_logits,
            out.model_output.pred_boxes,
            batch["positive_map"],
            batch["target_boxes"],
            batch["valid"],
        )
        qa = masked_dict_cross_entropy(
            out.vqa_preds, batch["answers"], batch.get("answer_type_mask")
        )
        total = det.total(weights)
        for name, value in qa.items():
            total = total + weights.get(name, 1.0) * value
        acc = masked_dict_accuracy(
            out.vqa_preds, batch["answers"], batch.get("answer_type_mask")
        )
        aux = {
            "soft_token_loss": det.soft_token_loss,
            "l1_loss": det.l1_loss,
            "giou_loss": det.giou_loss,
            **qa,
            "answer_total_accuracy": acc["answer_total_accuracy"],
        }
        return total, aux

    return loss_fn


def build_vqa_optimizer(
    params: Any,
    num_training_steps: int,
    steps_per_epoch: int,
    lr: float = 5e-5,
    lr_backbone: float = 5e-6,
    text_encoder_lr: float = 5e-6,
    schedule: str = "linear_with_warmup",
    epochs: int = 25,
    lr_drop: int = 10,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    """Per-submodule AdamW exactly as the reference VQA run configures it
    (``vqa_finetune.py`` args: epochs=25, lr_drop=10, linear_with_warmup)."""
    schedules = mdetr_lr_schedules(
        schedule=schedule,
        lr=lr,
        lr_backbone=lr_backbone,
        text_encoder_lr=text_encoder_lr,
        num_training_steps=num_training_steps,
        steps_per_epoch=steps_per_epoch,
        lr_drop=lr_drop,
        epochs=epochs,
    )
    return build_mdetr_optimizer(params, schedules, weight_decay=weight_decay)


def finetune_vqa(
    model,
    params: Any,
    batches: Iterable[Dict[str, np.ndarray]],
    num_steps: int,
    steps_per_epoch: Optional[int] = None,
    ema_decay: Optional[float] = 0.9998,
    trainer_kwargs: Optional[Dict[str, Any]] = None,
    **optimizer_kwargs: Any,
) -> Tuple[Dict[str, Any], Optional[Any]]:
    """Run the fine-tune loop; returns (final trainer state, EMA params).

    EMA matches the reference's ``update_ema(model, model_ema, args.ema_decay)``
    per optimizer step; it is kept outside the jitted step and refreshed at
    log boundaries to avoid a per-step host sync.
    """
    from multimodal_tpu.training.trainer import Trainer

    steps_per_epoch = steps_per_epoch or num_steps
    optimizer = build_vqa_optimizer(
        params, num_training_steps=num_steps, steps_per_epoch=steps_per_epoch,
        **optimizer_kwargs,
    )
    trainer = Trainer(
        vqa_loss_fn(model), optimizer, **(trainer_kwargs or {"strategy": "ddp"})
    )
    state = trainer.restore_or_init(params)

    ema_params = init_ema(state["params"]) if ema_decay else None

    @jax.jit
    def ema_step(ema, params):
        return update_ema(ema, params, ema_decay)

    data_iter = iter(batches)

    # run in chunks so EMA tracks params without forcing per-step host pulls;
    # within a chunk the n EMA updates are applied to the chunk-final params —
    # a standard approximation that converges to stepwise EMA as decay -> 1
    chunk = max(1, min(16, num_steps))
    done = 0
    while done < num_steps:
        n = min(chunk, num_steps - done)
        state = trainer.fit(state, data_iter, num_steps=n)
        if ema_params is not None:
            for _ in range(n):
                ema_params = ema_step(ema_params, state["params"])
        done += n
    return state, ema_params


def evaluate_vqa(
    model,
    params: Any,
    batches: Iterable[Dict[str, np.ndarray]],
) -> Dict[str, float]:
    """GQA accuracy protocol (reference ``vqa_eval.py:26-99``): per-head
    masked accuracy and the combined answer_total_accuracy, sample-weighted
    across the eval stream."""

    @jax.jit
    def forward(params, batch):
        out = model.apply(
            params,
            batch["images"],
            batch["image_mask"],
            batch["text"],
            batch["text_attention_mask"],
        )
        return out.vqa_preds

    sums: Dict[str, float] = {}
    weights: Dict[str, float] = {}
    for batch in batches:
        preds = forward(params, jax.tree_util.tree_map(jnp.asarray, batch))
        acc = masked_dict_accuracy(
            preds, batch["answers"], batch.get("answer_type_mask")
        )
        bsz = next(iter(batch["answers"].values())).shape[0]
        for k, v in acc.items():
            mask = (batch.get("answer_type_mask") or {}).get(k.replace("_accuracy", ""))
            w = float(np.sum(mask)) if mask is not None else float(bsz)
            if k == "answer_total_accuracy":
                w = float(bsz)
            sums[k] = sums.get(k, 0.0) + float(v) * w
            weights[k] = weights.get(k, 0.0) + w
    return {k: sums[k] / max(weights[k], 1.0) for k in sums}
