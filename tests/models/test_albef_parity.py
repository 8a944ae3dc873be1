"""Converted-weight parity for the ALBEF multimodal (cross-attention)
encoder vs the reference (models/albef/multimodal_encoder.py:184) — the
ALBEF-specific architecture. The unimodal towers are standard ViT/BERT
stacks whose layer types are parity-covered elsewhere (CLIP/FLAVA tests)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_tpu.models.albef.multimodal_encoder import (  # noqa: E402
    ALBEFMultimodalEncoder,
)
from multimodal_tpu.utils.checkpoint import (  # noqa: E402
    albef_multimodal_encoder_params_from_torch,
)

from tests.reference_compat import import_reference  # noqa: E402

import_reference()

from torchmultimodal.models.albef.multimodal_encoder import (  # noqa: E402
    ALBEFMultimodalEncoder as RefALBEFMultimodalEncoder,
)

HIDDEN = 32
LAYERS = 3
HEADS = 4
INTERMEDIATE = 64


@pytest.fixture(scope="module")
def encoder_pair():
    torch.manual_seed(0)
    ref = RefALBEFMultimodalEncoder(
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=INTERMEDIATE,
    )
    ref.eval()
    ours = ALBEFMultimodalEncoder(
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=INTERMEDIATE,
    )
    params = albef_multimodal_encoder_params_from_torch(ref, LAYERS)
    return ref, ours, params


def test_albef_multimodal_encoder_parity(encoder_pair):
    ref, ours, params = encoder_pair
    rng = np.random.RandomState(0)
    text_hidden = rng.randn(2, 7, HIDDEN).astype(np.float32)
    image_hidden = rng.randn(2, 11, HIDDEN).astype(np.float32)
    attn_mask = np.ones((2, 7), np.float32)
    attn_mask[1, 5:] = 0.0  # padded text positions

    with torch.no_grad():
        want = ref(
            torch.as_tensor(text_hidden),
            torch.as_tensor(attn_mask),
            torch.as_tensor(image_hidden),
        ).numpy()

    got = np.asarray(
        jax.jit(ours.apply)(
            params,
            jnp.asarray(text_hidden),
            attention_mask=jnp.asarray(attn_mask),
            encoder_hidden_states=jnp.asarray(image_hidden),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_albef_multimodal_encoder_parity_no_mask(encoder_pair):
    ref, ours, params = encoder_pair
    rng = np.random.RandomState(1)
    text_hidden = rng.randn(1, 5, HIDDEN).astype(np.float32)
    image_hidden = rng.randn(1, 9, HIDDEN).astype(np.float32)

    with torch.no_grad():
        want = ref(
            torch.as_tensor(text_hidden),
            torch.ones(1, 5),
            torch.as_tensor(image_hidden),
        ).numpy()

    got = np.asarray(
        ours.apply(
            params,
            jnp.asarray(text_hidden),
            attention_mask=jnp.ones((1, 5)),
            encoder_hidden_states=jnp.asarray(image_hidden),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
