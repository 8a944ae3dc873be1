"""FLAVA forward/pretraining tests (small configs; mirrors reference
``tests/models/flava/test_flava.py`` intent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.models.flava.model import (
    FLAVAForClassification,
    FLAVAForPreTraining,
    flava_model,
    flava_model_for_classification,
    flava_model_for_pretraining,
)

from tests.test_utils import assert_expected, rng

SMALL = dict(
    image_hidden_size=32,
    image_num_attention_heads=2,
    image_num_hidden_layers=2,
    image_intermediate_size=64,
    image_size=32,
    patch_size=8,
    text_hidden_size=32,
    text_num_attention_heads=2,
    text_num_hidden_layers=2,
    text_intermediate_size=64,
    vocab_size=100,
    max_position_embeddings=32,
    multimodal_hidden_size=32,
    multimodal_num_attention_heads=2,
    multimodal_num_hidden_layers=2,
    multimodal_intermediate_size=64,
    text_and_image_proj_size=24,
)


@pytest.fixture(scope="module")
def mm_inputs():
    r = np.random.RandomState(0)
    image = jnp.asarray(r.rand(2, 32, 32, 3).astype(np.float32))
    text = jnp.asarray(r.randint(1, 99, (2, 8), dtype=np.int32))
    return image, text


def test_flava_model_forward_mm(mm_inputs):
    image, text = mm_inputs
    model = flava_model(**SMALL)
    params = model.init(rng(), image=image, text=text, text_masked=text)
    out = model.apply(params, image=image, text=text, text_masked=text)

    n_patches = (32 // 8) ** 2
    assert out.image.last_hidden_state.shape == (2, n_patches + 1, 32)
    assert out.text.last_hidden_state.shape == (2, 8, 32)
    assert out.projected_image_embeddings.shape == (2, 24)
    assert out.projected_text_embeddings.shape == (2, 24)
    # mm CLS + (patches + img CLS) + text tokens
    assert out.multimodal_masked.last_hidden_state.shape == (2, 1 + n_patches + 1 + 8, 32)
    assert out.multimodal.last_hidden_state is None  # skipped by default
    assert out.image.pooler_output.shape == (2, 32)


def test_flava_model_unimodal(mm_inputs):
    image, text = mm_inputs
    model = flava_model(**SMALL)
    params = model.init(rng(), image=image, text=text, text_masked=text)
    out_img = model.apply(params, image=image, required_embedding="image")
    assert out_img.image.last_hidden_state is not None
    assert out_img.text.last_hidden_state is None
    out_txt = model.apply(params, text=text, required_embedding="text")
    assert out_txt.text.last_hidden_state is not None
    assert out_txt.image.last_hidden_state is None


@pytest.mark.slow
def test_flava_pretraining_mm_losses(mm_inputs):
    image, text = mm_inputs
    model = flava_model_for_pretraining(codebook_image_size=32, **SMALL)
    r = np.random.RandomState(1)
    n_patches = 16
    codebook_img = jnp.asarray(r.rand(2, 32, 32, 3).astype(np.float32))
    patches_mask = jnp.asarray(r.randint(0, 2, (2, n_patches)).astype(np.float32))
    itm_labels = jnp.asarray([1, 0])
    mlm_labels = jnp.asarray(r.randint(-1, 99, (2, 8), dtype=np.int32))

    kwargs = dict(
        image=image, text=text, image_for_codebook=codebook_img,
        image_patches_mask=patches_mask, text_masked=text,
        itm_labels=itm_labels, mlm_labels=mlm_labels,
    )
    params = model.init(rng(), **kwargs)
    out = model.apply(params, **kwargs)
    # mm case: itm + mmm_text + mmm_image + contrastive present, mim/mlm absent
    assert out.losses.itm_loss is not None
    assert out.losses.mmm_text_loss is not None
    assert out.losses.mmm_image_loss is not None
    assert out.losses.global_contrastive_loss is not None
    assert out.losses.mim_loss is None
    assert out.losses.mlm_loss is None
    total = out.losses.total()
    assert np.isfinite(float(total))
    # gradients flow
    def loss_fn(p):
        return model.apply(p, **kwargs).losses.total()
    g = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.slow
def test_flava_pretraining_unimodal_losses(mm_inputs):
    image, text = mm_inputs
    model = flava_model_for_pretraining(codebook_image_size=32, **SMALL)
    r = np.random.RandomState(2)
    mlm_labels = jnp.asarray(r.randint(-1, 99, (2, 8), dtype=np.int32))
    init_kwargs = dict(
        image=image, text=text,
        image_for_codebook=jnp.asarray(r.rand(2, 32, 32, 3).astype(np.float32)),
        image_patches_mask=jnp.asarray(r.randint(0, 2, (2, 16)).astype(np.float32)),
        text_masked=text, itm_labels=jnp.asarray([1, 0]), mlm_labels=mlm_labels,
    )
    params = model.init(rng(), **init_kwargs)
    out = model.apply(
        params, text=text, text_masked=text, mlm_labels=mlm_labels,
        required_embedding="text",
    )
    assert out.losses.mlm_loss is not None
    assert out.losses.itm_loss is None


def test_flava_classification(mm_inputs):
    image, text = mm_inputs
    model = flava_model_for_classification(
        num_classes=5, classifier_in_dim=32, classifier_hidden_sizes=16, **SMALL
    )
    labels = jnp.asarray([0, 3])
    params = model.init(rng(), image=image, text=text, labels=labels)
    out = model.apply(params, image=image, text=text, labels=labels)
    assert out.logits.shape == (2, 5)
    assert np.isfinite(float(out.loss))


@pytest.mark.slow
def test_remat_gradients_match():
    """remat=True (activation checkpointing, the reference's
    apply_activation_checkpointing at native/train.py:148-165) must give
    bit-comparable gradients to the plain forward."""
    kwargs = dict(SMALL)
    model_plain = flava_model(**kwargs)
    model_remat = flava_model(**kwargs, remat=True)

    image = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32))
    text = jnp.asarray(np.random.RandomState(1).randint(1, 99, (2, 8)))
    params = model_plain.init(rng(0), image=image, text=text, text_masked=text)

    def loss(m):
        def f(p):
            out = m.apply(p, image=image, text=text, text_masked=text)
            return jnp.sum(out.projected_image_embeddings ** 2) + jnp.sum(
                out.projected_text_embeddings ** 2
            )
        return f

    l1, g1 = jax.value_and_grad(loss(model_plain))(params)
    l2, g2 = jax.value_and_grad(loss(model_remat))(params)
    assert_expected(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        assert_expected(a, b, atol=1e-5, rtol=1e-5)
