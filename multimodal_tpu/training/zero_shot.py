"""Zero-shot classification evaluation (CLIP-style).

Parity with reference ``examples/flava/callbacks/multimodal_eval.py`` and
``examples/flava/data/imagenet_zeroshot_data.py``: build a classifier from
classnames x prompt templates via the text encoder (averaged, normalized
per class), then score image embeddings against it.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

# Compact 7-template ensemble (openai's recommended subset) used as the
# default for cheap in-training eval; the full 80-template x 1,000-classname
# ImageNet protocol lives in ``multimodal_tpu/data/imagenet_zeroshot.py``
# (shipped as a JSON asset) and is what ``imagenet_zero_shot_eval`` runs.
DEFAULT_PROMPT_TEMPLATES = (
    "itap of a {}.",
    "a bad photo of the {}.",
    "a origami {}.",
    "a photo of the large {}.",
    "a {} in a video game.",
    "art of the {}.",
    "a photo of the small {}.",
)


def build_zero_shot_classifier(
    encode_text: Callable[[np.ndarray], jnp.ndarray],
    tokenize: Callable[[List[str]], np.ndarray],
    classnames: Sequence[str],
    templates: Sequence[str] = DEFAULT_PROMPT_TEMPLATES,
    batch_size: int = 64,
) -> jnp.ndarray:
    """Returns an (embed_dim, n_classes) classifier matrix.

    For each class: encode all prompt variants, normalize, average,
    re-normalize (the reference's imagenet zero-shot protocol).
    """
    weights = []
    for i in range(0, len(classnames), batch_size):
        chunk = classnames[i : i + batch_size]
        prompts = [t.format(name) for name in chunk for t in templates]
        tokens = tokenize(prompts)
        emb = encode_text(tokens)  # (chunk * templates, d)
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        emb = emb.reshape(len(chunk), len(templates), -1).mean(axis=1)
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        weights.append(emb)
    return jnp.concatenate(weights, axis=0).T  # (d, n_classes)


def zero_shot_accuracy(
    image_embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    classifier: jnp.ndarray,
    top_k: Sequence[int] = (1, 5),
) -> dict:
    """Top-k accuracy of normalized image embeddings vs the classifier."""
    img = image_embeddings / jnp.maximum(
        jnp.linalg.norm(image_embeddings, axis=-1, keepdims=True), 1e-12
    )
    logits = img @ classifier  # (b, n_classes)
    max_k = max(top_k)
    top = jnp.argsort(-logits, axis=-1)[:, :max_k]
    out = {}
    for k in top_k:
        correct = jnp.any(top[:, :k] == labels[:, None], axis=1)
        out[f"top{k}"] = float(jnp.mean(correct))
    return out
