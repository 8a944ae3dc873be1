"""Full-scale MAE-base converted-weight parity: the real ViT-B/16 MAE
config (12L/768 encoder, 8L/512 decoder, 224px — reference
models/masked_auto_encoder/model.py vit_b_16_image_mae defaults)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_tpu.models.masked_auto_encoder.model import image_mae  # noqa: E402
from multimodal_tpu.utils.checkpoint import mae_params_from_torch  # noqa: E402

from tests.reference_compat import import_reference  # noqa: E402

import_reference()

from torchmultimodal.models.masked_auto_encoder.model import (  # noqa: E402
    image_mae as torch_image_mae,
)

BASE = dict(
    image_size=224, patch_size=16,
    encoder_layers=12, encoder_heads=12, encoder_hidden_dim=768,
    encoder_dim_feedforward=3072,
    decoder_layers=8, decoder_heads=16, decoder_hidden_dim=512,
    decoder_dim_feedforward=2048,
)


def _cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


@pytest.mark.slow
def test_mae_base_fullscale_eval_encoder_parity():
    torch.manual_seed(5)
    ref = torch_image_mae(**BASE).eval()
    params = mae_params_from_torch(
        ref.state_dict(), encoder_layers=12, decoder_layers=8
    )
    model = image_mae(**BASE)

    img = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        want = ref(img)

    got = jax.jit(model.apply)(params, jnp.asarray(img.permute(0, 2, 3, 1).numpy()))
    want_arr = (want.encoder_output.last_hidden_state
                if hasattr(want, "encoder_output") else want).numpy()
    got_arr = np.asarray(got.encoder_output.last_hidden_state
                         if hasattr(got, "encoder_output") and got.encoder_output is not None
                         else got)
    cos = _cosine(want_arr, got_arr)
    assert cos > 0.999, f"encoder cosine {cos}"
