"""Full-scale CoCa ViT-B/32 parity: the real 12L/768-vision + 12L/512-text
+ 12L-fusion config through the converter (toy configs can hide
head-count-dependent reshape bugs). Reference builder
``models/coca/coca_model.py:351`` (cascaded pooler)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from multimodal_tpu.models.coca.coca_model import coca_vit_b_32  # noqa: E402
from multimodal_tpu.utils.checkpoint import coca_params_from_torch  # noqa: E402

from tests.reference_compat import import_reference  # noqa: E402

import_reference()

from torchmultimodal.models.coca.coca_model import (  # noqa: E402
    coca_vit_b_32 as torch_coca_vit_b_32,
)


def _cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


@pytest.mark.slow
def test_coca_vit_b32_fullscale_parity():
    torch.manual_seed(11)
    ref = torch_coca_vit_b_32().eval()
    params = coca_params_from_torch(
        ref.state_dict(),
        vision_layers=12,
        text_layers=12,
        fusion_layers=12,
        num_poolers=2,  # the b_32 builder uses the cascaded pooler
    )
    model = coca_vit_b_32()

    img = torch.randn(2, 3, 224, 224)
    ids = torch.randint(1, 49408, (2, 77))
    with torch.no_grad():
        ref_out = ref(img, ids)

    out = model.apply(
        params,
        jnp.asarray(img.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(ids.numpy()),
    )

    for name, want, got in [
        ("image", ref_out.image_pooled_output, out.image_pooled_output),
        ("text", ref_out.text_pooled_output, out.text_pooled_output),
        ("mm", ref_out.multimodal_embeddings, out.multimodal_embeddings),
    ]:
        want = want.numpy().reshape(np.asarray(got).shape)
        cos = _cosine(want, got)
        assert cos > 0.999, f"{name} cosine {cos}"
