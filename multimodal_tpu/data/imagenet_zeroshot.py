"""ImageNet zero-shot evaluation data + protocol.

The 1,000 ImageNet class names and the 80 OpenAI CLIP prompt templates are
shipped as a static JSON asset (``assets/imagenet_zeroshot.json``) — the
same public open_clip data the reference vendors as 1,095 LoC of Python at
``examples/flava/data/imagenet_zeroshot_data.py``.

``imagenet_zero_shot_eval`` reproduces the reference callback's protocol
(``examples/flava/callbacks/multimodal_eval.py``): per class, encode all 80
prompts, normalize, average, re-normalize -> classifier matrix; then top-1/5
accuracy of normalized image embeddings against it.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Callable, Dict, Iterable, List, Sequence

import jax.numpy as jnp
import numpy as np

from multimodal_tpu.training.zero_shot import (
    build_zero_shot_classifier,
    zero_shot_accuracy,
)

_ASSET = os.path.join(os.path.dirname(__file__), "assets", "imagenet_zeroshot.json")


@lru_cache(maxsize=1)
def _load_asset() -> dict:
    with open(_ASSET) as f:
        return json.load(f)


def imagenet_classnames() -> List[str]:
    """The 1,000 ImageNet-1k class names (open_clip canonical wording)."""
    return list(_load_asset()["classnames"])


def imagenet_templates() -> List[str]:
    """The 80 OpenAI CLIP prompt templates as ``str.format`` strings."""
    return list(_load_asset()["templates"])


def imagenet_zero_shot_eval(
    encode_image: Callable[[np.ndarray], jnp.ndarray],
    encode_text: Callable[[np.ndarray], jnp.ndarray],
    tokenize: Callable[[Sequence[str]], np.ndarray],
    batches: Iterable[Dict[str, np.ndarray]],
    classnames: Sequence[str] = None,
    templates: Sequence[str] = None,
    top_k: Sequence[int] = (1, 5),
) -> Dict[str, float]:
    """Full zero-shot protocol over an image/label batch stream.

    ``batches`` yields {"image": ..., "labels": ...} (an
    ``ImageDataModule.eval_batches()`` stream); ``encode_image`` maps the
    image field to embeddings.
    """
    classnames = imagenet_classnames() if classnames is None else classnames
    templates = imagenet_templates() if templates is None else templates
    classifier = build_zero_shot_classifier(
        encode_text, tokenize, classnames, templates
    )
    correct = {k: 0 for k in top_k}
    total = 0
    max_k = max(top_k)
    for batch in batches:
        emb = encode_image(batch["image"])
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        logits = emb @ classifier
        top = np.asarray(jnp.argsort(-logits, axis=-1)[:, :max_k])
        labels = np.asarray(batch["labels"])
        for k in top_k:
            correct[k] += int(np.sum(np.any(top[:, :k] == labels[:, None], axis=1)))
        total += labels.shape[0]
    return {f"top{k}": correct[k] / max(total, 1) for k in top_k}


__all__ = [
    "imagenet_classnames",
    "imagenet_templates",
    "imagenet_zero_shot_eval",
    "build_zero_shot_classifier",
    "zero_shot_accuracy",
]
