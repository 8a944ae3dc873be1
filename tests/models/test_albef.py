"""ALBEF tests: momentum forward, queue machinery, hard negatives, losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from multimodal_tpu.models.albef.image_encoder import ALBEFVisionEncoder
from multimodal_tpu.models.albef.model import (
    ALBEFModel,
    ALBEFModelWithSimilarity,
    ALBEFQueues,
    albef_forward_with_momentum,
    albef_with_similarity_forward,
    init_albef_queues,
)
from multimodal_tpu.models.albef.multimodal_encoder import ALBEFMultimodalEncoder
from multimodal_tpu.models.flava.text_encoder import flava_text_encoder
from multimodal_tpu.modules.losses.albef import (
    causal_language_modeling_loss,
    image_text_contrastive_loss,
)

from tests.test_utils import assert_expected, rng

HID = 24


def small_albef():
    vision = ALBEFVisionEncoder(
        image_size=16, patch_size=8, num_hidden_layers=2, num_attention_heads=2,
        hidden_size=HID, mlp_dim=48,
    )
    text = flava_text_encoder(
        num_hidden_layers=2, hidden_size=HID, num_attention_heads=2,
        intermediate_size=48, vocab_size=60, max_position_embeddings=16,
    )
    mm = ALBEFMultimodalEncoder(
        hidden_size=HID, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=48,
    )
    return ALBEFModel(vision, text, mm, momentum=0.99)


@pytest.fixture(scope="module")
def albef_setup():
    model = small_albef()
    r = np.random.RandomState(0)
    image = jnp.asarray(r.rand(2, 16, 16, 3).astype(np.float32))
    text = jnp.asarray(r.randint(1, 59, (2, 6), dtype=np.int32))
    atts = jnp.ones((2, 6), jnp.int32)
    variables = model.init(rng(0), image, text, atts)
    return model, variables, image, text, atts


def test_albef_forward_with_momentum(albef_setup):
    model, variables, image, text, atts = albef_setup
    variables_m = jax.tree_util.tree_map(jnp.copy, variables)
    out, new_m = albef_forward_with_momentum(
        model, variables, variables_m, image, text, atts, deterministic=True
    )
    assert out.image_embeddings.shape == (2, 5, HID)
    assert out.multimodal_embeddings.shape == (2, 6, HID)
    # identical start -> identical momentum outputs
    assert_expected(out.image_embeddings_m, out.image_embeddings, atol=1e-5)

    # EMA moves momentum towards params
    variables_m2 = jax.tree_util.tree_map(jnp.zeros_like, variables)
    _, new_m2 = albef_forward_with_momentum(
        model, variables, variables_m2, image, text, atts, deterministic=True
    )
    leaf = jax.tree_util.tree_leaves(new_m2)[0]
    ref_leaf = jax.tree_util.tree_leaves(variables)[0]
    assert_expected(leaf, 0.01 * np.asarray(ref_leaf), rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_albef_with_similarity_step(albef_setup):
    model, _, image, text, atts = albef_setup
    module = ALBEFModelWithSimilarity(
        albef_model=model,
        vision_proj=nn.Dense(8),
        text_proj=nn.Dense(8),
        embed_size=8,
        queue_size=16,
    )
    variables = module.init(rng(1), image, text, atts)
    variables_m = jax.tree_util.tree_map(jnp.copy, variables)
    queues = init_albef_queues(rng(2), embed_size=8, queue_size=16)
    idx = jnp.asarray([5, 9])

    out, new_m, new_queues = albef_with_similarity_forward(
        module, variables, variables_m, queues, image, text, atts, idx,
        rng(3), deterministic=True,
    )
    assert out.similarity.sim_i2t.shape == (2, 2 + 16)
    assert out.multimodal_embeddings_neg.shape == (4, 6, HID)
    assert out.sim_targets.shape == (2, 18)
    # targets: only self-match in batch since queue has mask ids
    assert_expected(out.sim_targets[:, :2], np.eye(2))
    # queue advanced
    assert int(new_queues.queue_ptr) == 2
    assert int(new_queues.idx_queue[0, 0]) == 5
    assert int(new_queues.idx_queue[0, 1]) == 9
    # second step wraps the ring
    out2, _, q2 = albef_with_similarity_forward(
        module, variables, new_m, new_queues, image, text, atts, idx,
        rng(4), deterministic=True,
    )
    assert int(q2.queue_ptr) == 4
    # grads flow through similarity to the encoder params
    def loss_fn(v):
        o, _, _ = albef_with_similarity_forward(
            module, v, variables_m, queues, image, text, atts, idx,
            rng(5), deterministic=True,
        )
        return image_text_contrastive_loss(
            o.similarity.sim_i2t, o.similarity.sim_t2i,
            o.similarity.sim_i2t_m, o.similarity.sim_t2i_m,
            o.sim_targets, alpha=0.4,
        )
    g = jax.grad(loss_fn)(variables)
    gsum = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0


def test_itc_loss_behavior():
    sim = jnp.asarray([[10.0, -10.0], [-10.0, 10.0]])
    loss = image_text_contrastive_loss(sim, sim)
    assert float(loss) < 1e-4  # perfectly aligned
    loss_bad = image_text_contrastive_loss(-sim, -sim)
    assert float(loss_bad) > 5.0


def test_causal_lm_loss():
    scores = jnp.zeros((2, 5, 7))
    labels = jnp.asarray([[1, 2, 3, -100, -100], [1, -100, -100, -100, -100]])
    loss = causal_language_modeling_loss(labels, scores)
    assert loss.shape == (2,)
    # uniform logits: each valid token costs log(7)
    assert_expected(loss, np.array([2 * np.log(7), 0.0]), rtol=1e-5)  # labels shift by 1

    scores_m = jnp.zeros((2, 5, 7))
    loss_d = causal_language_modeling_loss(labels, scores, scores_m, alpha=0.5)
    assert loss_d.shape == (2,)
