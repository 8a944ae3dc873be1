"""Full-scale CLIP RN50 converted-weight parity (the modified-ResNet tower
at its real config: layers (3,4,6,3), width 64, 32-head attention pool,
1024-d embeddings — reference models/clip/model.py:117). The tiny-config
ResNet parity test can hide head-count/width-dependent converter bugs; this
runs the real thing end to end through both towers."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_tpu.models.clip.model import clip_rn50  # noqa: E402
from multimodal_tpu.utils.checkpoint import (  # noqa: E402
    clip_resnet_params_from_torch,
    clip_text_encoder_params_from_torch,
)

from tests.reference_compat import import_reference  # noqa: E402

import_reference()

from torchmultimodal.models.clip.model import clip_rn50 as torch_clip_rn50  # noqa: E402


def _cosine(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    num = np.sum(a * b, axis=-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return float(np.min(num / den))


@pytest.mark.slow
def test_clip_rn50_fullscale_parity():
    torch.manual_seed(11)
    ref = torch_clip_rn50(pretrained=False).eval()
    sd = ref.state_dict()

    vision_sd = {
        k[len("encoder_a."):]: v for k, v in sd.items() if k.startswith("encoder_a.")
    }
    vision_vars = clip_resnet_params_from_torch(vision_sd, layers=(3, 4, 6, 3))
    text_params = clip_text_encoder_params_from_torch(sd, "encoder_b.", 12)
    variables = {
        "params": {
            "encoder_a": vision_vars["params"],
            "encoder_b": text_params,
        },
        "batch_stats": {"encoder_a": vision_vars["batch_stats"]},
    }

    model = clip_rn50()
    img = torch.randn(2, 3, 224, 224)
    ids = torch.randint(1, 49407, (2, 77))
    ids[:, -1] = 49407  # EOT = highest id (argmax pooling)
    with torch.no_grad():
        ref_out = ref(img, ids)

    out = jax.jit(model.apply)(
        variables,
        jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(ids.numpy()),
    )
    cos_img = _cosine(out.embeddings_a, ref_out.embeddings_a.numpy())
    cos_txt = _cosine(out.embeddings_b, ref_out.embeddings_b.numpy())
    assert cos_img >= 0.999, f"image cosine {cos_img}"
    assert cos_txt >= 0.999, f"text cosine {cos_txt}"
