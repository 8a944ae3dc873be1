"""MDETR joint transformer parity vs the PyTorch reference.

The full reference MDETR needs torchvision's ResNet-101 (unavailable here),
but the architecturally novel part — the joint image+text encoder-decoder
with DETR-style per-layer positional embeddings and shared decoder norm — is
self-contained and converted/compared exactly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from multimodal_tpu.models.mdetr.transformer import MDETRTransformer
from multimodal_tpu.utils.checkpoint import mdetr_transformer_params_from_torch

from tests.reference_compat import import_reference

import_reference()

from torchmultimodal.models.mdetr.transformer import (  # noqa: E402
    MDETRTransformer as TorchMDETRTransformer,
)

CFG = dict(d_model=32, num_heads=2, num_encoder_layers=2, num_decoder_layers=2,
           dim_feedforward=64, dropout=0.0)


def test_mdetr_transformer_parity_tiny():
    torch.manual_seed(0)
    ref = TorchMDETRTransformer(**CFG).eval()
    params = mdetr_transformer_params_from_torch(
        ref.state_dict(), num_encoder_layers=2, num_decoder_layers=2
    )
    model = MDETRTransformer(**CFG)

    b, fh, fw, d, nq, tlen = 2, 3, 4, 32, 6, 5
    img = torch.randn(b, d, fh, fw)
    pos = torch.randn(b, d, fh, fw)
    img_mask = torch.zeros(b, fh, fw, dtype=torch.bool)
    img_mask[1, :, 2:] = True  # padded region on sample 1
    text = torch.randn(tlen, b, d)  # torch layout: (seq, batch, dim)
    text_mask = torch.zeros(b, tlen, dtype=torch.bool)
    text_mask[0, 3:] = True
    query = torch.randn(nq, d)

    with torch.no_grad():
        want = ref(img, img_mask, query, pos, text, text_mask)

    got = model.apply(
        params,
        jnp.asarray(img.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(img_mask.numpy()),
        jnp.asarray(query.numpy()),
        jnp.asarray(pos.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(text.permute(1, 0, 2).numpy()),
        jnp.asarray(text_mask.numpy()),
    )

    # decoder hidden states: torch (n_layers, nq, b, d)-ish vs ours -- compare
    # after aligning layouts
    want_dec = want.decoder_hidden_states.numpy()
    got_dec = np.asarray(got.decoder_hidden_states)
    assert want_dec.shape == got_dec.shape, (want_dec.shape, got_dec.shape)
    np.testing.assert_allclose(got_dec, want_dec, atol=5e-4, rtol=1e-3)

    # torch text_memory is seq-first (tlen, b, d); ours is batch-first
    want_txt = want.text_memory.numpy().transpose(1, 0, 2)
    np.testing.assert_allclose(
        np.asarray(got.text_memory), want_txt, atol=5e-4, rtol=1e-3
    )
