"""FLAVA parity vs the PyTorch reference (converted random weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from multimodal_tpu.models.flava.model import flava_model
from multimodal_tpu.utils.checkpoint import flava_params_from_torch

from tests.reference_compat import import_reference

import_reference()

from torchmultimodal.models.flava.model import flava_model as torch_flava_model  # noqa: E402

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


def _cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_flava_model_parity_small():
    torch.manual_seed(0)
    ref = torch_flava_model(**SMALL).eval()
    params = flava_params_from_torch(
        ref.state_dict(), image_layers=2, text_layers=2, mm_layers=2
    )
    model = flava_model(**SMALL)

    img = torch.randn(2, 3, 32, 32)
    ids = torch.randint(1, 99, (2, 8))
    with torch.no_grad():
        ref_out = ref(image=img, text=ids, text_masked=ids)

    out = model.apply(
        params,
        image=jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
        text=jnp.asarray(ids.numpy()),
        text_masked=jnp.asarray(ids.numpy()),
    )

    pairs = [
        (out.image.last_hidden_state, ref_out.image.last_hidden_state),
        (out.text.last_hidden_state, ref_out.text.last_hidden_state),
        (out.multimodal_masked.last_hidden_state,
         ref_out.multimodal_masked.last_hidden_state),
        (out.projected_image_embeddings, ref_out.projected_image_embeddings),
        (out.projected_text_embeddings, ref_out.projected_text_embeddings),
    ]
    for mine, theirs in pairs:
        cos = _cosine(mine, theirs.numpy())
        assert cos > 0.999, cos
        np.testing.assert_allclose(
            np.asarray(mine), theirs.numpy(), rtol=5e-3, atol=1e-4
        )

@pytest.mark.slow
def test_flava_model_parity_fullsize():
    """FLAVA-base at the real config (12L/768 towers, 6L mm encoder).

    Converter bugs that only appear at full width/head-count (reshape
    ordering in the fused-QKV concat, pos-emb shapes) are invisible at the
    toy scale above; this exercises ``flava_params_from_torch`` at the
    reference defaults (``models/flava/model.py:428-464``).
    """
    torch.manual_seed(3)
    ref = torch_flava_model().eval()
    params = flava_params_from_torch(ref.state_dict())
    model = flava_model()

    img = torch.randn(1, 3, 224, 224)
    ids = torch.randint(1, 30000, (1, 16))
    with torch.no_grad():
        ref_out = ref(image=img, text=ids, text_masked=ids)

    import jax

    out = jax.jit(model.apply)(
        params,
        image=jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
        text=jnp.asarray(ids.numpy()),
        text_masked=jnp.asarray(ids.numpy()),
    )
    pairs = [
        (out.image.last_hidden_state, ref_out.image.last_hidden_state),
        (out.text.last_hidden_state, ref_out.text.last_hidden_state),
        (out.multimodal_masked.last_hidden_state,
         ref_out.multimodal_masked.last_hidden_state),
        (out.projected_image_embeddings, ref_out.projected_image_embeddings),
        (out.projected_text_embeddings, ref_out.projected_text_embeddings),
    ]
    for mine, theirs in pairs:
        cos = _cosine(mine, theirs.numpy())
        assert cos > 0.999, cos
