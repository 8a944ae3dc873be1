"""MDETR tests: backbone, transformer, model, matcher, losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.models.mdetr.image_encoder import (
    FrozenBatchNorm2d,
    ResNetBackbone,
    position_embedding_2d,
)
from multimodal_tpu.models.mdetr.model import (
    MDETRForPhraseGrounding,
    mdetr_for_phrase_grounding,
    mdetr_for_vqa,
    mdetr_resnet101,
    pad_images,
    pad_text,
)
from multimodal_tpu.modules.losses.mdetr import (
    box_cxcywh_to_xyxy,
    generalized_box_iou,
    hungarian_assignment_np,
    mdetr_loss,
)

from tests.test_utils import assert_expected, rng

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


def test_pad_helpers():
    images = [np.ones((8, 10, 3), np.float32), np.ones((12, 6, 3), np.float32)]
    batch, mask = pad_images(images)
    assert batch.shape == (2, 12, 10, 3)
    assert mask[0, :8, :10].sum() == 0 and mask[0, 8:, :].all()
    text = [np.array([5, 6, 7]), np.array([9])]
    tb, tm = pad_text(text)
    assert tb.shape == (2, 3)
    assert tm.tolist() == [[False, False, False], [False, True, True]]


def test_position_embedding_2d():
    mask = np.zeros((1, 4, 6), bool)
    mask[:, 3:, :] = True
    pos = position_embedding_2d(jnp.asarray(mask), num_pos_feats=8)
    assert pos.shape == (1, 4, 6, 16)


def test_frozen_bn_no_grads():
    bn = FrozenBatchNorm2d(4)
    x = jnp.ones((1, 2, 2, 4))
    params = bn.init(rng(0), x)
    g = jax.grad(lambda p: jnp.sum(bn.apply(p, x) ** 2))(params)
    assert sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g)) == 0.0


@pytest.mark.slow
def test_resnet_backbone_shape():
    net = ResNetBackbone(layers=(1, 1, 1, 1))
    x = jnp.ones((1, 64, 64, 3))
    params = net.init(rng(0), x)
    y = net.apply(params, x)
    assert y.shape == (1, 2, 2, 2048)  # 64/32 spatial, 512*4 channels


@pytest.fixture(scope="module")
def mdetr_inputs():
    r = np.random.RandomState(0)
    images, image_mask = pad_images(
        [r.rand(64, 64, 3).astype(np.float32), r.rand(48, 64, 3).astype(np.float32)]
    )
    text, text_mask = pad_text(
        [r.randint(2, 99, 7), r.randint(2, 99, 5)]
    )
    return (jnp.asarray(images), jnp.asarray(image_mask),
            jnp.asarray(text), jnp.asarray(text_mask))


def test_mdetr_forward(mdetr_inputs):
    model = mdetr_resnet101(**TINY)
    params = model.init(rng(0), *mdetr_inputs)
    out = model.apply(params, *mdetr_inputs)
    assert out.pred_logits.shape == (2, 6, 11)
    assert out.pred_boxes.shape == (2, 6, 4)
    assert float(out.pred_boxes.min()) >= 0 and float(out.pred_boxes.max()) <= 1
    # intermediate decoder states from both layers
    assert out.transformer_output.decoder_hidden_states.shape[0] == 2


@pytest.mark.slow
def test_mdetr_phrase_grounding_and_loss(mdetr_inputs):
    model = mdetr_for_phrase_grounding(contrastive_dim=16, **TINY)
    params = model.init(rng(0), *mdetr_inputs)
    out = model.apply(params, *mdetr_inputs)
    q_emb = out.contrastive_embeddings["query_embeddings"]
    t_emb = out.contrastive_embeddings["token_embeddings"]
    assert q_emb.shape == (2, 6, 16)

    # padded targets: 2 boxes for sample 0, 1 for sample 1
    max_boxes = 3
    n_tok = out.model_output.pred_logits.shape[-1]
    r = np.random.RandomState(1)
    boxes = jnp.asarray(np.clip(r.rand(2, max_boxes, 4), 0.1, 0.9).astype(np.float32))
    pos_map = jnp.asarray((r.rand(2, max_boxes, n_tok) > 0.7).astype(np.float32))
    pos_map = pos_map / jnp.maximum(pos_map.sum(-1, keepdims=True), 1.0)
    valid = jnp.asarray([[True, True, False], [True, False, False]])

    # alignment positive map over text tokens
    L = t_emb.shape[1]
    align_map = jnp.asarray((r.rand(2, max_boxes, L) > 0.5).astype(np.float32))

    losses = mdetr_loss(
        out.model_output.pred_logits, out.model_output.pred_boxes,
        pos_map, boxes, valid,
        query_embeddings=q_emb,
        token_embeddings=t_emb,
        align_positive_map=align_map,
    )
    for name, val in losses._asdict().items():
        if val is not None:
            assert np.isfinite(float(val)), name
    assert np.isfinite(float(losses.total()))


@pytest.mark.slow
def test_mdetr_vqa_heads(mdetr_inputs):
    model = mdetr_for_vqa(num_extra_query_embeddings=6, **TINY)
    params = model.init(rng(0), *mdetr_inputs)
    out = model.apply(params, *mdetr_inputs)
    assert set(out.vqa_preds) == {
        "answer_attr", "answer_cat", "answer_global", "answer_obj",
        "answer_rel", "answer_type",
    }
    assert out.vqa_preds["answer_type"].shape == (2, 5)
    # extra queries detached from detection outputs
    assert out.model_output.pred_logits.shape[1] == 6


def test_giou_and_matcher():
    a = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
    same = generalized_box_iou(box_cxcywh_to_xyxy(a), box_cxcywh_to_xyxy(a))
    assert_expected(same, np.ones((1, 1)), atol=1e-6)

    # trivial matching: cost identity -> diagonal assignment
    cost = np.asarray([[[0.1, 5.0], [5.0, 0.1], [3.0, 3.0]]])  # (1, q=3, m=2)
    valid = np.asarray([[True, True]])
    assign = hungarian_assignment_np(cost, valid)
    assert assign.tolist() == [[0, 1]]
    # padding respected
    valid2 = np.asarray([[True, False]])
    assign2 = hungarian_assignment_np(cost, valid2)
    assert assign2[0, 0] == 0 and assign2[0, 1] == -1
