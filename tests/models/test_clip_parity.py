"""CLIP parity vs the PyTorch reference (random fixed weights, converted).

Mirrors the reference's checkpoint tests
(``tests/models/clip/test_checkpoint.py``) without network access: build the
reference model with a fixed seed, convert its state dict with
``clip_params_from_torch``, and require cosine ≥ 0.999 between JAX and torch
output embeddings.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from multimodal_tpu.models.clip.image_encoder import CLIPViTEncoder
from multimodal_tpu.models.clip.model import CLIP
from multimodal_tpu.models.clip.text_encoder import CLIPTextEncoder
from multimodal_tpu.utils.checkpoint import (
    clip_text_encoder_params_from_torch,
    clip_vit_encoder_params_from_torch,
)

from tests.reference_compat import import_reference

tmm = import_reference()

from torchmultimodal.models.clip.image_encoder import CLIPViTEncoder as TorchViT  # noqa: E402
from torchmultimodal.models.clip.text_encoder import CLIPTextEncoder as TorchText  # noqa: E402


def _cosine(a, b):
    a = np.asarray(a, dtype=np.float64).ravel()
    b = np.asarray(b, dtype=np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_vit_encoder_parity_small():
    torch.manual_seed(0)
    ref = TorchViT(
        embedding_dim=32, patch_size=16, image_size=64, width=64, heads=4, layers=3
    ).eval()
    params = {
        "params": clip_vit_encoder_params_from_torch(ref.state_dict(), n_layers=3)
    }
    model = CLIPViTEncoder(
        embedding_dim=32, patch_size=16, image_size=64, width=64, heads=4, layers=3
    )

    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref_out = ref(x).numpy()
    x_jax = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))  # NCHW -> NHWC
    out = model.apply(params, x_jax)
    assert _cosine(out, ref_out) > 0.9999
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3, atol=1e-4)


def test_text_encoder_parity_small():
    torch.manual_seed(1)
    ref = TorchText(
        embedding_dim=32, context_length=12, vocab_size=100, width=64,
        dim_feedforward=128, heads=4, layers=3,
    ).eval()
    params = {
        "params": clip_text_encoder_params_from_torch(ref.state_dict(), n_layers=3)
    }
    model = CLIPTextEncoder(
        embedding_dim=32, context_length=12, vocab_size=100, width=64,
        dim_feedforward=128, heads=4, layers=3,
    )
    ids = torch.randint(1, 99, (2, 12))
    ids[:, -1] = 99  # EOT = highest id
    with torch.no_grad():
        ref_out = ref(ids).numpy()
    out = model.apply(params, jnp.asarray(ids.numpy()))
    assert _cosine(out, ref_out) > 0.9999
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3, atol=1e-4)


def test_clip_full_parity_small():
    """Full CLIP wrapper: normalized embeddings match."""
    torch.manual_seed(2)
    ref_vit = TorchViT(
        embedding_dim=24, patch_size=8, image_size=32, width=32, heads=2, layers=2
    )
    ref_text = TorchText(
        embedding_dim=24, context_length=10, vocab_size=50, width=32,
        dim_feedforward=64, heads=2, layers=2,
    )
    from torchmultimodal.models.clip.model import CLIP as TorchCLIP

    ref = TorchCLIP(ref_vit, ref_text).eval()
    sd = ref.state_dict()
    params = {
        "params": {
            "encoder_a": clip_vit_encoder_params_from_torch(sd, "encoder_a.", 2),
            "encoder_b": clip_text_encoder_params_from_torch(sd, "encoder_b.", 2),
        }
    }
    model = CLIP(
        CLIPViTEncoder(embedding_dim=24, patch_size=8, image_size=32, width=32, heads=2, layers=2),
        CLIPTextEncoder(embedding_dim=24, context_length=10, vocab_size=50, width=32,
                        dim_feedforward=64, heads=2, layers=2),
    )
    img = torch.randn(2, 3, 32, 32)
    ids = torch.randint(1, 49, (2, 10))
    ids[:, -1] = 49
    with torch.no_grad():
        ref_out = ref(img, ids)
    out = model.apply(
        params, jnp.asarray(img.numpy().transpose(0, 2, 3, 1)), jnp.asarray(ids.numpy())
    )
    assert _cosine(out.embeddings_a, ref_out.embeddings_a.numpy()) > 0.999
    assert _cosine(out.embeddings_b, ref_out.embeddings_b.numpy()) > 0.999
