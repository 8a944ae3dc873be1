"""AudioMAE Swin decoder parity (scaled-cosine attention + log-CPB MLP)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from multimodal_tpu.models.masked_auto_encoder.swin_decoder import SwinTransformer
from multimodal_tpu.utils.checkpoint import swin_decoder_params_from_torch

from tests.reference_compat import import_reference

import_reference()

from torchmultimodal.models.masked_auto_encoder.swin_decoder import (  # noqa: E402
    SwinTransformer as TorchSwinTransformer,
)

CFG = dict(n_layer=2, input_dim=16, num_heads=2, input_size=(4, 6),
           window_size=(2, 3), feedforward_dim=32)


def test_swin_decoder_parity_tiny():
    """Shifted windows (layer 1 shifts), per-head tau clamp, continuous
    relative-position bias from the 2->heads meta-MLP."""
    torch.manual_seed(0)
    ref = TorchSwinTransformer(**CFG).eval()
    params = swin_decoder_params_from_torch(ref.state_dict(), n_layer=2)
    model = SwinTransformer(**CFG)

    x = torch.randn(2, 24, 16)  # (b, h*w, c)
    with torch.no_grad():
        want = ref(x)
    want = (want.last_hidden_state if hasattr(want, "last_hidden_state") else want).numpy()

    got = model.apply(params, jnp.asarray(x.numpy()))
    got = np.asarray(got.last_hidden_state if hasattr(got, "last_hidden_state") else got)
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
