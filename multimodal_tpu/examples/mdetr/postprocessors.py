"""MDETR evaluation postprocessors.

TPU-native re-expression of the reference Flickr30k postprocessor
(``examples/mdetr/data/postprocessors.py:16-109``). The reference loops over
phrases on the host with per-phrase ``torch.sort``; here the whole batch of
phrases is scored and sorted in ONE vectorized jitted computation: phrases
are flattened across the batch ("collapsed" layout, same as the reference),
mapped back to their sample via a host-built index vector, and the per-phrase
score/argsort runs as a single (P, Q) matrix op on device. Only the final
nested-list packaging happens on the host.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.modules.losses.mdetr import box_cxcywh_to_xyxy


@partial(jax.jit, static_argnames=())
def _score_and_sort_boxes(
    prob: jnp.ndarray,          # (b, q, num_classes) softmaxed logits
    boxes_abs: jnp.ndarray,     # (b, q, 4) xyxy, absolute coords
    positive_map: jnp.ndarray,  # (p, num_classes) binary/soft phrase->token map
    phrase_to_sample: jnp.ndarray,  # (p,) int sample index of each phrase
) -> jnp.ndarray:
    """Return (p, q, 4) boxes for each phrase, sorted by descending score."""
    pos = (positive_map > 1e-6).astype(prob.dtype)       # binarize (ref :70)
    prob_p = prob[phrase_to_sample]                       # (p, q, c)
    # score = max over this phrase's positive tokens (ref :88-89)
    scores = jnp.max(pos[:, None, :] * prob_p, axis=-1)   # (p, q)
    order = jnp.argsort(-scores, axis=-1)                  # descending (ref :91)
    boxes_p = boxes_abs[phrase_to_sample]                  # (p, q, 4)
    return jnp.take_along_axis(boxes_p, order[:, :, None], axis=1)


@jax.jit
def _scale_boxes(output_bbox: jnp.ndarray, target_sizes: jnp.ndarray) -> jnp.ndarray:
    """cxcywh relative -> xyxy absolute (ref :60-65)."""
    boxes = box_cxcywh_to_xyxy(output_bbox)                # (b, q, 4)
    img_h, img_w = target_sizes[:, 0], target_sizes[:, 1]
    scale = jnp.stack([img_w, img_h, img_w, img_h], axis=1)  # (b, 4)
    return boxes * scale[:, None, :].astype(boxes.dtype)


def post_process_flickr(
    output_logits: jnp.ndarray,          # (b, q, num_classes)
    output_bbox: jnp.ndarray,            # (b, q, 4) cxcywh in [0, 1]
    target_sizes: jnp.ndarray,           # (b, 2) original (h, w) per image
    positive_map: jnp.ndarray,           # (total_phrases, num_classes)
    phrases_per_sample: Sequence[int],
) -> List[List[List[List[float]]]]:
    """Convert raw MDETR outputs into per-phrase ranked box lists.

    Returns ``out[sample][phrase]`` = list of ``[x0, y0, x1, y1]`` boxes sorted
    by descending confidence, matching the reference contract
    (``postprocessors.py:38-40``) for ``Flickr30kEntitiesRecallEvaluator``.
    """
    batch_size = int(output_logits.shape[0])
    if target_sizes.shape[0] != batch_size or target_sizes.shape[1] != 2:
        raise ValueError("target_sizes must be (batch_size, 2)")
    phrases_per_sample = [int(n) for n in phrases_per_sample]
    total = sum(phrases_per_sample)
    if positive_map.shape[0] != total:
        raise ValueError(
            "first dim of positive_map must equal sum of phrases_per_sample"
        )
    out: List[List[List[List[float]]]] = [[] for _ in range(batch_size)]
    if total == 0:
        return out

    phrase_to_sample = jnp.asarray(
        np.repeat(np.arange(batch_size), phrases_per_sample), jnp.int32
    )
    prob = jax.nn.softmax(output_logits, axis=-1)
    boxes_abs = _scale_boxes(output_bbox, jnp.asarray(target_sizes))
    sorted_boxes = np.asarray(
        _score_and_sort_boxes(prob, boxes_abs, jnp.asarray(positive_map), phrase_to_sample)
    )

    offset = 0
    for sample, n in enumerate(phrases_per_sample):
        for p in range(n):
            out[sample].append(sorted_boxes[offset + p].tolist())
        offset += n
    return out
