"""MDETR losses + Hungarian matcher.

Parity with reference ``modules/losses/mdetr.py``
(soft_token_prediction_loss:44, box_losses:121) and
``examples/mdetr/matcher.py:16`` (HungarianMatcher) /
``examples/mdetr/loss.py:21`` (contrastive alignment).

jit-safe re-expression: targets are PADDED to ``max_boxes`` per sample with
a validity mask instead of ragged lists; the matcher output is a per-sample
``(max_boxes,)`` array of assigned query indices (-1 for padding). The
Hungarian assignment itself (scipy ``linear_sum_assignment``) is a host-side
CPU boundary exactly as in the reference — exposed both as a pure-numpy
function for the input pipeline and as a ``jax.pure_callback`` wrapper so it
can sit inside a jitted step.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- box utils
def box_cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU for xyxy boxes: (n, 4) x (m, 4) -> (n, m)."""
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None] - inter
    iou = inter / jnp.maximum(union, 1e-9)
    lt_hull = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb_hull = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh_hull = jnp.clip(rb_hull - lt_hull, 0)
    hull = wh_hull[..., 0] * wh_hull[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)


# ---------------------------------------------------------------- matcher
def hungarian_cost_matrix(
    pred_logits: jnp.ndarray,    # (q, num_tokens) raw logits for one sample
    pred_boxes: jnp.ndarray,     # (q, 4) cxcywh
    positive_map: jnp.ndarray,   # (max_boxes, num_tokens)
    target_boxes: jnp.ndarray,   # (max_boxes, 4)
    cost_class: float = 1.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
) -> jnp.ndarray:
    """Per-sample (q, max_boxes) matching cost (reference matcher.py:16)."""
    probs = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    cost_cls = -(probs @ positive_map.T)  # soft-token alignment cost
    cost_l1 = jnp.sum(
        jnp.abs(pred_boxes[:, None] - target_boxes[None]), axis=-1
    )
    cost_g = -generalized_box_iou(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(target_boxes)
    )
    return cost_class * cost_cls + cost_bbox * cost_l1 + cost_giou * cost_g


def hungarian_assignment_np(cost: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Host-side assignment: for each valid target, the matched query index.

    cost: (b, q, max_boxes); valid: (b, max_boxes) bool.
    Returns (b, max_boxes) int32 with -1 for invalid targets.
    """
    from scipy.optimize import linear_sum_assignment

    b, q, m = cost.shape
    out = np.full((b, m), -1, np.int32)
    for i in range(b):
        n = int(valid[i].sum())
        if n == 0:
            continue
        c = np.nan_to_num(cost[i, :, :n], nan=1e6, posinf=1e6, neginf=-1e6)
        rows, cols = linear_sum_assignment(c)
        out[i, cols] = rows
    return out


def hungarian_matcher(cost: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """pure_callback wrapper usable inside jit (host CPU boundary, like the
    reference's scipy matcher)."""
    b, _, m = cost.shape
    return jax.pure_callback(
        lambda c, v: hungarian_assignment_np(np.asarray(c), np.asarray(v)),
        jax.ShapeDtypeStruct((b, m), jnp.int32),
        cost, valid,
    )


# ---------------------------------------------------------------- losses
def soft_token_prediction_loss(
    pred_logits: jnp.ndarray,   # (b, q, num_tokens)
    positive_map: jnp.ndarray,  # (b, max_boxes, num_tokens)
    assignment: jnp.ndarray,    # (b, max_boxes) query index per target, -1 pad
    valid: jnp.ndarray,         # (b, max_boxes)
    num_boxes: float,
    no_object_weight: float = 0.1,
) -> jnp.ndarray:
    """NLL of the uniform distribution over matched tokens (reference :44)."""
    b, q, n_tok = pred_logits.shape
    logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)

    # target distribution: default no-object (last token), matched rows get
    # their positive map
    target = jnp.zeros((b, q, n_tok)).at[:, :, -1].set(1.0)
    weights = jnp.full((b, q), no_object_weight)

    safe_assign = jnp.where(valid, assignment, 0)
    onehot = jax.nn.one_hot(safe_assign, q) * valid[..., None]  # (b, m, q)
    # scatter positive maps onto matched queries
    target_matched = jnp.einsum("bmq,bmt->bqt", onehot, positive_map.astype(jnp.float32))
    matched_mask = jnp.einsum("bmq->bq", onehot) > 0
    target = jnp.where(matched_mask[..., None], target_matched, target)
    weights = jnp.where(matched_mask, 1.0, weights)

    loss = -jnp.sum(logp * target, axis=-1) * weights
    return jnp.sum(loss) / jnp.maximum(num_boxes, 1.0)


class BoxLosses(NamedTuple):
    l1_loss: jnp.ndarray
    giou_loss: jnp.ndarray


def box_losses(
    pred_boxes: jnp.ndarray,    # (b, q, 4) cxcywh
    target_boxes: jnp.ndarray,  # (b, max_boxes, 4)
    assignment: jnp.ndarray,    # (b, max_boxes)
    valid: jnp.ndarray,         # (b, max_boxes)
    num_boxes: float,
) -> BoxLosses:
    """Matched L1 + GIoU losses (reference :121)."""
    safe_assign = jnp.where(valid, assignment, 0)
    matched = jnp.take_along_axis(pred_boxes, safe_assign[..., None], axis=1)
    w = valid.astype(jnp.float32)[..., None]

    l1 = jnp.sum(jnp.abs(matched - target_boxes) * w) / jnp.maximum(num_boxes, 1.0)

    def per_sample_giou(m, t, v):
        g = generalized_box_iou(box_cxcywh_to_xyxy(m), box_cxcywh_to_xyxy(t))
        return jnp.sum((1 - jnp.diagonal(g)) * v)

    giou = jax.vmap(per_sample_giou)(matched, target_boxes, valid.astype(jnp.float32))
    return BoxLosses(l1, jnp.sum(giou) / jnp.maximum(num_boxes, 1.0))


def contrastive_alignment_loss(
    query_embeddings: jnp.ndarray,   # (b, q, d) normalized
    token_embeddings: jnp.ndarray,   # (b, L, d) normalized
    positive_map: jnp.ndarray,       # (b, max_boxes, L) box -> token map
    assignment: jnp.ndarray,         # (b, max_boxes)
    valid: jnp.ndarray,              # (b, max_boxes)
    num_boxes: float,
    temperature: float = 0.07,
) -> jnp.ndarray:
    """Bidirectional InfoNCE between matched queries and their tokens
    (reference examples/mdetr/loss.py:21)."""
    logits = jnp.einsum("bqd,bld->bql", query_embeddings, token_embeddings) / temperature
    b, q, L = logits.shape

    safe_assign = jnp.where(valid, assignment, 0)
    onehot = jax.nn.one_hot(safe_assign, q) * valid[..., None]  # (b, m, q)
    pos = jnp.einsum("bmq,bml->bql", onehot, positive_map.astype(jnp.float32)) > 0

    # query -> tokens
    logZ_q = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    logp_q = logits - logZ_q
    npos_q = jnp.maximum(jnp.sum(pos, axis=-1), 1)
    loss_q = -jnp.sum(jnp.where(pos, logp_q, 0.0), axis=-1) / npos_q
    has_pos_q = jnp.any(pos, axis=-1)
    loss_q = jnp.sum(jnp.where(has_pos_q, loss_q, 0.0))

    # token -> queries
    logZ_t = jax.nn.logsumexp(logits, axis=1, keepdims=True)
    logp_t = logits - logZ_t
    npos_t = jnp.maximum(jnp.sum(pos, axis=1), 1)
    loss_t = -jnp.sum(jnp.where(pos, logp_t, 0.0), axis=1) / npos_t
    has_pos_t = jnp.any(pos, axis=1)
    loss_t = jnp.sum(jnp.where(has_pos_t, loss_t, 0.0))

    return (loss_q + loss_t) / 2 / jnp.maximum(num_boxes, 1.0)


class MDETRLossOutput(NamedTuple):
    soft_token_loss: jnp.ndarray
    l1_loss: jnp.ndarray
    giou_loss: jnp.ndarray
    contrastive_alignment_loss: Optional[jnp.ndarray] = None

    def total(self, weights: Optional[Dict[str, float]] = None) -> jnp.ndarray:
        w = {"soft_token_loss": 1.0, "l1_loss": 5.0, "giou_loss": 2.0,
             "contrastive_alignment_loss": 1.0, **(weights or {})}
        total = 0.0
        for name, value in self._asdict().items():
            if value is not None:
                total = total + w[name] * value
        return total


def mdetr_loss(
    pred_logits: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    positive_map: jnp.ndarray,
    target_boxes: jnp.ndarray,
    valid: jnp.ndarray,
    query_embeddings: Optional[jnp.ndarray] = None,
    token_embeddings: Optional[jnp.ndarray] = None,
    align_positive_map: Optional[jnp.ndarray] = None,  # (b, max_boxes, text_len)
    no_object_weight: float = 0.1,
    temperature: float = 0.07,
) -> MDETRLossOutput:
    """Full MDETR objective: match, then soft-token + box (+ alignment).

    ``positive_map`` maps boxes to CLASSIFICATION token bins (soft-token
    loss); ``align_positive_map`` maps boxes to TEXT tokens (contrastive
    alignment) — they differ in general."""
    cost = jax.vmap(hungarian_cost_matrix)(pred_logits, pred_boxes, positive_map, target_boxes)
    assignment = hungarian_matcher(jax.lax.stop_gradient(cost), valid)
    num_boxes = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)

    st = soft_token_prediction_loss(
        pred_logits, positive_map, assignment, valid, num_boxes, no_object_weight
    )
    bl = box_losses(pred_boxes, target_boxes, assignment, valid, num_boxes)
    ca = None
    if query_embeddings is not None and token_embeddings is not None:
        if align_positive_map is None:
            raise ValueError(
                "align_positive_map required for contrastive alignment loss"
            )
        ca = contrastive_alignment_loss(
            query_embeddings, token_embeddings, align_positive_map, assignment,
            valid, num_boxes, temperature,
        )
    return MDETRLossOutput(st, bl.l1_loss, bl.giou_loss, ca)


# ------------------------------------------------------------ VQA head losses

def masked_dict_cross_entropy(
    pred_dict: Dict[str, jnp.ndarray],     # each (b, num_answers_k)
    label_dict: Dict[str, jnp.ndarray],    # each (b,) int labels
    mask_dict: Optional[Dict[str, jnp.ndarray]] = None,  # each (b,) bool
) -> Dict[str, jnp.ndarray]:
    """Per-answer-head cross entropy gated by answer-type mask.

    Parity with reference ``examples/mdetr/loss.py:157-176``, with the
    intended per-sample masking semantics: each head's CE is averaged over
    the samples whose answer type activates that head (the reference's early
    ``reduction='mean'`` collapses the batch before its mask can apply). A
    head with no active samples contributes 0.
    """
    if pred_dict.keys() != label_dict.keys():
        raise ValueError("Keys of pred_dict and label_dict must match")
    losses = {}
    for k, logits in pred_dict.items():
        logp = jax.nn.log_softmax(logits, axis=-1)
        per_sample = -jnp.take_along_axis(
            logp, label_dict[k][:, None], axis=-1
        )[:, 0]
        if mask_dict is None or mask_dict.get(k) is None:
            losses[f"{k}_loss"] = jnp.mean(per_sample)
        else:
            mask = mask_dict[k].astype(per_sample.dtype)
            losses[f"{k}_loss"] = jnp.sum(per_sample * mask) / jnp.maximum(
                jnp.sum(mask), 1.0
            )
    return losses


def masked_dict_accuracy(
    pred_dict: Dict[str, jnp.ndarray],
    label_dict: Dict[str, jnp.ndarray],
    mask_dict: Optional[Dict[str, jnp.ndarray]] = None,
    answer_type_key: str = "answer_type",
) -> Dict[str, jnp.ndarray]:
    """Per-head masked accuracy + combined GQA accuracy.

    Parity with reference ``examples/mdetr/loss.py:125-154``:
    ``answer_total_accuracy`` = answer-type accuracy x (mask-count-weighted
    mean of the per-type head accuracies) / batch size. Heads with no active
    samples report accuracy 1.0, as in the reference.
    """
    accuracies = {}
    mask_counts = {}
    for k, logits in pred_dict.items():
        correct = (jnp.argmax(logits, axis=-1) == label_dict[k]).astype(jnp.float32)
        if mask_dict is None or mask_dict.get(k) is None:
            mask = jnp.ones_like(correct)
        else:
            mask = mask_dict[k].astype(jnp.float32)
        count = jnp.sum(mask)
        mask_counts[k] = count
        accuracies[f"{k}_accuracy"] = jnp.where(
            count > 0, jnp.sum(correct * mask) / jnp.maximum(count, 1.0), 1.0
        )
    weighted = sum(
        accuracies[f"{k}_accuracy"] * mask_counts[k]
        for k in pred_dict if k != answer_type_key
    )
    batch = label_dict[answer_type_key].shape[0]
    accuracies["answer_total_accuracy"] = (
        accuracies[f"{answer_type_key}_accuracy"] * weighted / batch
    )
    return accuracies


def build_weight_dict(
    ce_loss_coef: float = 1.0,
    bbox_loss_coef: float = 5.0,
    giou_loss_coef: float = 2.0,
    qa_loss_coef: float = 1.0,
    contrastive_align_loss_coef: float = 1.0,
    vqa_keys=None,
    include_contrastive_loss: bool = True,
) -> Dict[str, float]:
    """Loss-term weights (reference ``examples/mdetr/loss.py:317-332``)."""
    weights = {
        "soft_token_loss": ce_loss_coef,
        "l1_loss": bbox_loss_coef,
        "giou_loss": giou_loss_coef,
    }
    if vqa_keys is not None:
        for k in vqa_keys:
            weights[f"{k}_loss"] = qa_loss_coef
    if include_contrastive_loss:
        weights["contrastive_alignment_loss"] = contrastive_align_loss_coef
    return weights
