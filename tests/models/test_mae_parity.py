"""MAE parity vs the PyTorch reference (converted random weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from multimodal_tpu.models.masked_auto_encoder.model import image_mae
from multimodal_tpu.utils.checkpoint import mae_params_from_torch

from tests.reference_compat import import_reference

import_reference()

from torchmultimodal.models.masked_auto_encoder.model import (  # noqa: E402
    image_mae as torch_image_mae,
)

TINY = dict(
    image_size=32, patch_size=8,
    encoder_layers=2, encoder_heads=2, encoder_hidden_dim=32,
    encoder_dim_feedforward=64,
    decoder_layers=2, decoder_heads=2, decoder_hidden_dim=16,
    decoder_dim_feedforward=32,
)


def _cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_mae_eval_encoder_parity():
    torch.manual_seed(0)
    ref = torch_image_mae(**TINY).eval()
    params = mae_params_from_torch(ref.state_dict(), encoder_layers=2, decoder_layers=2)
    model = image_mae(**TINY)

    img = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        want = ref(img)

    got = model.apply(params, jnp.asarray(img.permute(0, 2, 3, 1).numpy()))
    want_arr = (want.encoder_output.last_hidden_state
                if hasattr(want, "encoder_output") else want).numpy()
    got_arr = np.asarray(got.encoder_output.last_hidden_state
                         if hasattr(got, "encoder_output") and got.encoder_output is not None
                         else got)
    cos = _cosine(want_arr, got_arr)
    assert cos > 0.999, f"encoder cosine {cos}"
    np.testing.assert_allclose(got_arr, want_arr, atol=5e-4, rtol=1e-3)


def test_mae_train_decoder_parity_no_masking():
    """With masking_ratio=0 both frameworks keep every patch (in different
    shuffle orders); the decoder restores order, so predictions must match."""
    torch.manual_seed(0)
    ref = torch_image_mae(**TINY, masking_ratio=0.0).train()
    params = mae_params_from_torch(ref.state_dict(), encoder_layers=2, decoder_layers=2)
    model = image_mae(**TINY, masking_ratio=0.0)

    img = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        want = ref(img)

    got = model.apply(
        params,
        jnp.asarray(img.permute(0, 2, 3, 1).numpy()),
        deterministic=False,
        rngs={"masking": jax.random.PRNGKey(3),
              "patch_drop": jax.random.PRNGKey(4)},
    )
    cos = _cosine(want.decoder_pred.numpy(), got.decoder_pred)
    assert cos > 0.999, f"decoder cosine {cos}"
    np.testing.assert_allclose(
        np.asarray(got.decoder_pred), want.decoder_pred.numpy(),
        atol=1e-3, rtol=1e-3,
    )
