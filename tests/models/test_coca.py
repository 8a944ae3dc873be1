"""CoCa tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from multimodal_tpu.models.coca.coca_model import (
    CoCaForPretraining,
    CoCaModelWithHeads,
    coca_vit,
)
from multimodal_tpu.models.coca.text_decoder import CoCaTextDecoder

from tests.test_utils import assert_expected, rng

SMALL = dict(
    vision_patch_size=8, vision_n_layer=2, vision_n_head=2,
    vision_dim_feedforward=48, image_size=16, vocab_size=50,
    num_text_positions=12, text_hidden_dim=16, text_n_layer=2, text_n_head=2,
    text_dim_feedforward=48, text_output_dim=16, fusion_n_layer=2,
    fusion_n_head=2, fusion_dim_feedforward=48,
    multimodal_output_projection_dim=50, pooler_input_embed_dim=24,
    pooler_output_embed_dim=16, pooler_n_head=2, pooler_n_queries=6,
)


@pytest.fixture(scope="module")
def inputs():
    r = np.random.RandomState(0)
    images = jnp.asarray(r.rand(2, 16, 16, 3).astype(np.float32))
    texts = jnp.asarray(r.randint(1, 49, (2, 12), dtype=np.int32))
    return images, texts


@pytest.mark.parametrize("cascaded", [True, False])
def test_coca_forward(inputs, cascaded):
    images, texts = inputs
    model = coca_vit(cascaded_pooler=cascaded, **SMALL)
    params = model.init(rng(0), images, texts)
    out = model.apply(params, images, texts)
    assert out.image_pooled_output.shape == (2, 16)
    assert out.text_pooled_output.shape == (2, 16)
    # embed_cls=True: mm sequence = num_text_positions - 1
    assert out.multimodal_embeddings.shape == (2, 11, 50)
    assert_expected(jnp.linalg.norm(out.image_pooled_output, axis=-1),
                    np.ones(2), atol=1e-5)


def test_coca_text_decoder_eot_pooling():
    dec = CoCaTextDecoder(
        vocab_size=30, num_positions=8, embedding_dim=16, n_layer=1, n_head=2,
        dim_feedforward=32, output_dim=12, embed_cls=False,
    )
    ids = jnp.asarray([[3, 5, 29, 1, 0, 0, 0, 0]])  # EOT=29 at pos 2
    params = dec.init(rng(0), ids)
    pooled, tokens = dec.apply(params, ids)
    assert pooled.shape == (1, 12)
    assert tokens.shape == (1, 8, 16)


@pytest.mark.slow
def test_coca_pretraining_losses(inputs):
    images, texts = inputs
    model = CoCaForPretraining(coca_vit(**SMALL))
    params = model.init(rng(0), images, texts)
    losses = model.apply(params, images, texts)
    assert np.isfinite(float(losses["contrastive"]))
    assert np.isfinite(float(losses["captioning"]))

    def total(p):
        l = model.apply(p, images, texts)
        return l["contrastive"] + l["captioning"]

    g = jax.grad(total)(params)
    gsum = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0


def test_coca_with_heads(inputs):
    images, texts = inputs
    model = CoCaModelWithHeads(
        model=coca_vit(**SMALL), heads={"cls": nn.Dense(4)},
    )
    params = model.init(rng(0), images, texts)
    out = model.apply(params, images, texts)
    assert out["cls"].shape == (2, 4)
