"""CLIP modified-ResNet parity (anti-aliased stride, AttentionPool2d)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from multimodal_tpu.models.clip.resnet_encoder import ResNetForCLIP
from multimodal_tpu.utils.checkpoint import clip_resnet_params_from_torch

from tests.reference_compat import import_reference

import_reference()

from torchmultimodal.models.clip.image_encoder import (  # noqa: E402
    ResNetForCLIP as TorchResNetForCLIP,
)

CFG = dict(layers=(1, 1, 1, 1), output_dim=16, heads=8,
           input_resolution=64, width=16)


def _cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_clip_resnet_parity_tiny():
    torch.manual_seed(0)
    ref = TorchResNetForCLIP(**CFG).eval()
    variables = clip_resnet_params_from_torch(ref.state_dict(), layers=CFG["layers"])
    model = ResNetForCLIP(**CFG)

    img = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = ref(img).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(img.permute(0, 2, 3, 1).numpy())))
    cos = _cosine(want, got)
    assert cos > 0.999, f"cosine {cos}"
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
