"""MDETR phrase-grounding evaluation loop.

Analog of the reference eval driver (``examples/mdetr/phrase_grounding.py:26-75``):
run the model over batches, post-process into per-phrase ranked boxes, feed
the Flickr30k evaluator, return the Recall@k report. Model execution is
jit-compiled; only the ragged packaging is host-side.

Each batch dict must carry:
  - model inputs: ``images (b,H,W,3)``, ``image_mask (b,H,W)``,
    ``text (b,L)``, ``text_mask (b,L)`` (padding conventions as in
    ``models/mdetr/model.py:pad_images/pad_text``)
  - eval metadata: ``orig_sizes (b,2)`` original (h,w) per image,
    ``positive_map_eval (P, num_classes)`` collapsed phrase->token-bin map,
    ``phrases_per_sample`` list of ints, ``image_ids``, ``sentence_ids``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, List

import jax
import jax.numpy as jnp

from multimodal_tpu.examples.mdetr.flickr_eval import Flickr30kEntitiesRecallEvaluator
from multimodal_tpu.examples.mdetr.postprocessors import post_process_flickr


def evaluate_phrase_grounding(
    apply_fn: Callable,          # (images, image_mask, text, text_mask) -> MDETRPhraseGroundingOutput
    batches: Iterable[Dict[str, Any]],
    evaluator: Flickr30kEntitiesRecallEvaluator,
) -> Dict[int, Dict[str, float]]:
    jitted = jax.jit(apply_fn)
    predictions: List[Dict[str, Any]] = []
    for batch in batches:
        out = jitted(
            jnp.asarray(batch["images"]), jnp.asarray(batch["image_mask"]),
            jnp.asarray(batch["text"]), jnp.asarray(batch["text_mask"]),
        )
        ranked = post_process_flickr(
            out.model_output.pred_logits,
            out.model_output.pred_boxes,
            jnp.asarray(batch["orig_sizes"], jnp.float32),
            jnp.asarray(batch["positive_map_eval"]),
            batch["phrases_per_sample"],
        )
        for img_id, sent_id, boxes in zip(
            batch["image_ids"], batch["sentence_ids"], ranked
        ):
            predictions.append(
                {"image_id": img_id, "sentence_id": sent_id, "boxes": boxes}
            )
    return evaluator.evaluate(predictions)
