"""COCO zero-shot retrieval recipe (reference examples/flava/coco_zero_shot.py)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.examples.flava.coco_zero_shot import (
    coco_caption_batches,
    coco_retrieval_eval,
)

CONFIG = os.path.join(
    os.path.dirname(__file__), "..", "..",
    "multimodal_tpu", "examples", "flava", "configs", "debug.yaml",
)


def test_recall_protocol_perfect_and_shuffled():
    """Identity-style encoders -> R@1 == 1; mismatched pairing degrades it."""
    n, d = 16, 8
    rng = np.random.RandomState(0)
    emb = rng.randn(n, d).astype(np.float32)

    def make_batches():
        return iter([{"image": emb[:8], "text": emb[:8]},
                     {"image": emb[8:], "text": emb[8:]}])

    out = coco_retrieval_eval(lambda x: x, lambda x: x, make_batches())
    assert out["image_to_text_recall@1"] == 1.0
    assert out["text_to_image_recall@1"] == 1.0
    assert out["image_to_text_recall@10"] == 1.0

    # text embeddings rolled by one -> the diagonal is never the top hit
    rolled = np.roll(emb, 1, axis=0)
    batches = iter([{"image": emb, "text": rolled}])
    out = coco_retrieval_eval(lambda x: x, lambda x: x, batches)
    assert out["image_to_text_recall@1"] < 0.5


def test_caption_batches_take_first_caption(tmp_path):
    """Multi-caption samples use caption[0] (reference coco_zero_shot.py:36)."""
    ds = [
        {"image": np.full((4, 4, 3), i, np.uint8),
         "text": [f"caption {i} a", f"caption {i} b"]}
        for i in range(5)
    ]
    seen = []

    def text_transform(texts):
        seen.extend(texts)
        return np.zeros((len(texts), 3), np.int32)

    batches = list(coco_caption_batches(
        ds, lambda im: np.asarray(im, np.float32), text_transform, batch_size=2
    ))
    assert [b["image"].shape[0] for b in batches] == [2, 2, 1]
    assert seen == [f"caption {i} a" for i in range(5)]


@pytest.mark.slow
def test_coco_eval_fn_on_tiny_flava(tmp_path):
    """build_coco_eval runs the full recipe path (dataset -> transforms ->
    FLAVA contrastive projections -> recall) on a synthetic caption jsonl."""
    from PIL import Image

    from multimodal_tpu.examples.flava.coco_zero_shot import build_coco_eval
    from multimodal_tpu.examples.flava.pretrain import DEFAULTS, _build_model
    from multimodal_tpu.utils.config import build_config

    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    path = tmp_path / "val.jsonl"
    with open(path, "w") as f:
        for i in range(8):
            p = img_dir / f"{i}.png"
            Image.fromarray(
                rng.randint(0, 256, (40, 48, 3), dtype=np.uint8)
            ).save(p)
            f.write(json.dumps(
                {"image": str(p), "text": [f"a photo of thing {i}"]}
            ) + "\n")

    cfg = build_config(
        CONFIG,
        overrides=[f"data.coco_path={path}", "data.eval_batch_size=4"],
        defaults=DEFAULTS,
    )
    model = _build_model(cfg)
    s = cfg["model"]["image_size"]
    params = model.init(
        jax.random.PRNGKey(0),
        image=jnp.zeros((1, s, s, 3)),
        text=jnp.zeros((1, cfg["data"]["text_len"]), jnp.int32),
        text_masked=jnp.zeros((1, cfg["data"]["text_len"]), jnp.int32),
        itm_labels=jnp.zeros((1,), jnp.int32),
        mlm_labels=jnp.zeros((1, cfg["data"]["text_len"]), jnp.int32),
    )
    metrics = build_coco_eval(cfg, model)(params)
    assert set(metrics) == {
        f"{d}_recall@{k}"
        for d in ("image_to_text", "text_to_image") for k in (1, 5, 10)
    }
    for v in metrics.values():
        assert 0.0 <= v <= 1.0
    # 8 items, k=10 >= gallery size -> everything retrieved
    assert metrics["image_to_text_recall@10"] == 1.0
