"""BLIP-2 tests: Q-Former behaviors, BLIP2 forward, stage-1 losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.models.albef.image_encoder import ALBEFVisionEncoder
from multimodal_tpu.models.blip2.blip2 import BLIP2
from multimodal_tpu.models.blip2.qformer_model import QformerForCLM
from multimodal_tpu.models.blip2.qformer_utils import get_causal_mask
from multimodal_tpu.modules.losses.blip2_losses import (
    Blip2Phase1Loss,
    blip2_phase1_loss,
)

from tests.test_utils import assert_expected, rng

DIM_Q = 24
VOCAB = 50


def build_blip2():
    qformer = QformerForCLM(
        num_hidden_layers=2, dim_q=DIM_Q, dim_feedforward=48, num_heads=2,
        max_position_embeddings=32, vocab_size=VOCAB, query_length=4,
        dim_kv=DIM_Q, cross_attention_freq=2,
    )
    vision = ALBEFVisionEncoder(
        image_size=16, patch_size=8, num_hidden_layers=2, num_attention_heads=2,
        hidden_size=DIM_Q, mlp_dim=48,
    )
    return BLIP2(
        qformer=qformer, vision_encoder=vision, dim_q=DIM_Q,
        image_encoder_embedding_dim=DIM_Q, embedding_dim=8, num_query_token=4,
        decoder_bos_token_id=49,
    )


@pytest.fixture(scope="module")
def blip2_setup():
    model = build_blip2()
    r = np.random.RandomState(0)
    image = jnp.asarray(r.rand(2, 16, 16, 3).astype(np.float32))
    ids = jnp.asarray(r.randint(1, 48, (2, 6), dtype=np.int32))
    mask = jnp.ones((2, 6), jnp.int32)
    variables = model.init(rng(0), image, ids, mask)
    return model, variables, image, ids, mask


def test_causal_mask_with_query_prefix():
    attn = jnp.ones((1, 7))  # 3 query + 4 text
    mask = get_causal_mask(attn, (1, 4), has_query=True)
    assert mask.shape == (1, 7, 7)
    # queries attend all queries, not text
    assert_expected(mask[0, :3, :3], np.ones((3, 3)))
    assert_expected(mask[0, :3, 3:], np.zeros((3, 4)))
    # text attends queries + causal text
    assert_expected(mask[0, 3:, :3], np.ones((4, 3)))
    assert_expected(mask[0, 3:, 3:], np.tril(np.ones((4, 4))))


def test_blip2_forward(blip2_setup):
    model, variables, image, ids, mask = blip2_setup
    out = model.apply(variables, image, ids, mask)
    assert out.image_embeddings.shape == (2, 5, DIM_Q)
    assert out.image_features.shape == (2, 4, 8)      # num_query x embed
    assert out.image_qformer_output.shape == (2, 4, DIM_Q)
    assert out.text_features.shape == (2, 8)
    assert out.prediction_scores.shape == (2, 6, VOCAB)
    # features normalized
    assert_expected(jnp.linalg.norm(out.image_features, axis=-1),
                    np.ones((2, 4)), atol=1e-5)


@pytest.mark.slow
def test_blip2_frozen_vision(blip2_setup):
    model, variables, image, ids, mask = blip2_setup

    def loss(v):
        out = model.apply(v, image, ids, mask)
        return jnp.sum(out.image_features ** 2)

    g = jax.grad(loss)(variables)
    vision_g = g["params"]["vision_encoder"]
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(vision_g))
    assert total == 0.0  # frozen encoder gets no grads


@pytest.mark.slow
def test_blip2_phase1_losses(blip2_setup):
    model, variables, image, ids, mask = blip2_setup
    out = model.apply(variables, image, ids, mask)

    loss_module = Blip2Phase1Loss(dim_q=DIM_Q)
    dummy_vl = jnp.zeros((2, 4, DIM_Q))
    loss_vars = loss_module.init(rng(1), dummy_vl)
    losses = blip2_phase1_loss(
        loss_module, loss_vars, model, variables, out, ids, mask, rng(2),
        decoder_bos_token_id=49, pad_token_id=0, vocab_size=VOCAB,
    )
    for name, l in losses._asdict().items():
        assert np.isfinite(float(l)), name
    assert_expected(
        losses.total_loss,
        losses.image_text_contrastive_loss
        + losses.image_text_matching_loss
        + losses.image_captioning_loss,
    )

    # gradient flows through full pipeline into qformer params
    def total(v):
        o = model.apply(v, image, ids, mask)
        return blip2_phase1_loss(
            loss_module, loss_vars, model, v, o, ids, mask, rng(3),
            decoder_bos_token_id=49, pad_token_id=0, vocab_size=VOCAB,
        ).total_loss

    g = jax.grad(total)(variables)
    qf = sum(float(jnp.sum(jnp.abs(l)))
             for l in jax.tree_util.tree_leaves(g["params"]["qformer"]))
    assert np.isfinite(qf) and qf > 0
