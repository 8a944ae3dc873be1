"""CoCa parity vs the PyTorch reference (converted random weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from multimodal_tpu.models.coca.coca_model import coca_vit
from multimodal_tpu.utils.checkpoint import coca_params_from_torch

from tests.reference_compat import import_reference

import_reference()

from torchmultimodal.models.coca.coca_model import coca_vit as torch_coca_vit  # noqa: E402

TINY = dict(
    vision_patch_size=8,
    vision_dim_feedforward=64,
    vision_n_layer=2,
    vision_n_head=2,
    vocab_size=50,
    num_text_positions=12,
    text_hidden_dim=32,
    text_n_layer=2,
    text_n_head=2,
    text_dim_feedforward=64,
    text_output_dim=32,
    fusion_n_layer=2,
    fusion_n_head=2,
    fusion_dim_feedforward=64,
    pooler_input_embed_dim=32,
    pooler_output_embed_dim=32,
    pooler_n_head=2,
    image_size=32,
    pooler_n_queries=5,
)


def _cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


@pytest.mark.parametrize("cascaded,embed_cls", [(True, True), (False, True), (True, False)])
def test_coca_parity_tiny(cascaded, embed_cls):
    torch.manual_seed(0)
    ref = torch_coca_vit(**TINY, cascaded_pooler=cascaded, text_embed_cls=embed_cls).eval()
    params = coca_params_from_torch(
        ref.state_dict(),
        vision_layers=2,
        text_layers=2,
        fusion_layers=2,
        num_poolers=2 if cascaded else 1,
    )
    model = coca_vit(**TINY, cascaded_pooler=cascaded, text_embed_cls=embed_cls)

    img = torch.randn(2, 3, 32, 32)
    ids = torch.randint(1, 49, (2, 12))
    with torch.no_grad():
        ref_out = ref(img, ids)

    out = model.apply(
        params,
        jnp.asarray(img.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(ids.numpy()),
    )

    pairs = [
        ("image", ref_out.image_pooled_output, out.image_pooled_output),
        ("text", ref_out.text_pooled_output, out.text_pooled_output),
        ("mm", ref_out.multimodal_embeddings, out.multimodal_embeddings),
    ]
    for name, want, got in pairs:
        # reference keeps the singleton query dim on the cascaded image output
        want = want.numpy().reshape(np.asarray(got).shape)
        cos = _cosine(want, got)
        assert cos > 0.999, f"{name} cosine {cos}"
        np.testing.assert_allclose(
            np.asarray(got), want, atol=5e-4, rtol=1e-3, err_msg=name,
        )
