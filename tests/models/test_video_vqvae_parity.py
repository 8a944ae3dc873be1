"""VideoVQVAE parity vs the PyTorch reference (converted random weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from multimodal_tpu.models.video_gpt.model import video_vqvae
from multimodal_tpu.utils.checkpoint import video_vqvae_params_from_torch

from tests.reference_compat import import_reference

import_reference()

from torchmultimodal.models.video_gpt.model import (  # noqa: E402
    video_vqvae as torch_video_vqvae,
)

TINY = dict(encoder_hidden_dim=16, n_res_layers=1, attn_hidden_dim=16,
            num_embeddings=8, embedding_dim=4, decoder_hidden_dim=16)


def test_video_vqvae_parity_tiny():
    """Covers SamePadConv3d, ConvTranspose3d kernel-flip conversion, BN
    running stats, axial attention (incl. always-biased output projection,
    reference attention.py:114), and codebook lookup."""
    torch.manual_seed(0)
    ref = torch_video_vqvae(**TINY).eval()
    variables = video_vqvae_params_from_torch(ref.state_dict())
    model = video_vqvae(**TINY)

    x = torch.randn(2, 3, 8, 8, 8)
    with torch.no_grad():
        want = ref(x)

    got = model.apply(variables, jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy()))

    want_dec = want.decoded.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(
        np.asarray(got.decoded), want_dec, atol=1e-4, rtol=1e-4,
    )
    want_idx = want.codebook_output.codebook_indices.numpy()
    got_idx = np.asarray(got.codebook_output.codebook_indices).reshape(want_idx.shape)
    assert (want_idx == got_idx).all()
