"""MDETR VQA fine-tune recipe: loss wiring, EMA, per-group optimizer, eval
protocol (reference examples/mdetr/vqa_finetune.py + vqa_eval.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.examples.mdetr.vqa_finetune import (
    evaluate_vqa,
    finetune_vqa,
    vqa_loss_fn,
)
from multimodal_tpu.models.mdetr import mdetr_for_vqa
from multimodal_tpu.models.mdetr.model import pad_images, pad_text

from tests.test_utils import rng

TINY = dict(
    num_queries=6,
    num_classes=10,
    embedding_dim=32,
    transformer_d_model=32,
    transformer_num_heads=2,
    transformer_encoder_layers=2,
    transformer_decoder_layers=2,
    transformer_dim_feedforward=64,
    transformer_dropout=0.0,
    text_encoder_kwargs=dict(
        num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
        vocab_size=100, max_position_embeddings=32,
    ),
    resnet_layers=(1, 1, 1, 1),
)

HEADS = {
    "answer_type": 5, "answer_obj": 3, "answer_rel": 1594,
    "answer_attr": 403, "answer_cat": 678, "answer_global": 111,
}


def _batch(r, b=8, max_boxes=3, num_classes=10, text_len=8):
    images, image_mask = pad_images(
        [r.rand(32, 32, 3).astype(np.float32) for _ in range(b)]
    )
    text, text_mask = pad_text([r.randint(2, 99, text_len) for _ in range(b)])
    positive_map = np.zeros((b, max_boxes, num_classes + 1), np.float32)
    positive_map[..., 0] = 1.0
    answer_type = r.randint(0, 5, (b,))
    return {
        "images": images,
        "image_mask": image_mask,
        "text": text,
        "text_attention_mask": text_mask,
        "positive_map": positive_map,
        "target_boxes": np.tile(
            np.asarray([0.5, 0.5, 0.2, 0.2], np.float32), (b, max_boxes, 1)
        ),
        "valid": np.asarray([[True] + [False] * (max_boxes - 1)] * b),
        "answers": {k: r.randint(0, n, (b,)) for k, n in HEADS.items()},
        "answer_type_mask": {
            "answer_type": np.ones((b,), bool),
            "answer_obj": answer_type == 0,
            "answer_attr": answer_type == 1,
            "answer_rel": answer_type == 2,
            "answer_cat": answer_type == 3,
            "answer_global": answer_type == 4,
        },
    }


def _batches(seed=0):
    r = np.random.RandomState(seed)
    while True:
        yield _batch(r)


def test_vqa_loss_fn_finite_and_complete():
    model = mdetr_for_vqa(num_extra_query_embeddings=6, **TINY)
    batch = _batch(np.random.RandomState(0), b=2)
    params = model.init(
        rng(0), jnp.asarray(batch["images"]), jnp.asarray(batch["image_mask"]),
        jnp.asarray(batch["text"]), jnp.asarray(batch["text_attention_mask"]),
    )
    loss, aux = vqa_loss_fn(model)(params, batch, rng(1))
    assert np.isfinite(float(loss))
    for k in ("soft_token_loss", "l1_loss", "giou_loss", "answer_type_loss",
              "answer_rel_loss", "answer_total_accuracy"):
        assert k in aux and np.isfinite(float(aux[k])), k


@pytest.mark.slow
def test_vqa_finetune_three_steps_and_eval():
    model = mdetr_for_vqa(num_extra_query_embeddings=6, **TINY)
    batch = _batch(np.random.RandomState(0))
    params = model.init(
        rng(0), jnp.asarray(batch["images"]), jnp.asarray(batch["image_mask"]),
        jnp.asarray(batch["text"]), jnp.asarray(batch["text_attention_mask"]),
    )
    state, ema_params = finetune_vqa(
        model, params, _batches(), num_steps=3, steps_per_epoch=3, epochs=1,
        lr_drop=1,
    )
    assert int(state["step"]) == 3
    # EMA drifted from init but stayed close (decay ~1)
    leaf = jax.tree_util.tree_leaves(state["params"])[0]
    ema_leaf = jax.tree_util.tree_leaves(ema_params)[0]
    assert np.isfinite(np.asarray(leaf)).all()
    assert not np.allclose(np.asarray(leaf), np.asarray(ema_leaf))

    gen = _batches(seed=1)
    metrics = evaluate_vqa(model, state["params"], [next(gen), next(gen)])
    assert "answer_total_accuracy" in metrics
    assert 0.0 <= metrics["answer_total_accuracy"] <= 1.0
    assert 0.0 <= metrics["answer_rel_accuracy"] <= 1.0
