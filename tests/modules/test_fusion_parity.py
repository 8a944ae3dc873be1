"""Fusion module parity vs the PyTorch reference."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from multimodal_tpu.modules.fusions.attention_fusion import AttentionFusionModule
from multimodal_tpu.modules.fusions.deepset_fusion import DeepsetFusionModule
from multimodal_tpu.modules.layers.mlp import MLP
from multimodal_tpu.utils.checkpoint import (
    attention_fusion_params_from_torch,
    deepset_fusion_params_from_torch,
)

from tests.reference_compat import import_reference

import_reference()

from torchmultimodal.modules.fusions.attention_fusion import (  # noqa: E402
    AttentionFusionModule as TorchAttentionFusion,
)
from torchmultimodal.modules.fusions.deepset_fusion import (  # noqa: E402
    DeepsetFusionModule as TorchDeepsetFusion,
)
from torchmultimodal.modules.layers.mlp import MLP as TorchMLP  # noqa: E402


def test_attention_fusion_parity():
    torch.manual_seed(0)
    ref = TorchAttentionFusion({"a": 4, "b": 6}, encoding_projection_dim=5).eval()
    params = attention_fusion_params_from_torch(ref.state_dict())
    model = AttentionFusionModule(
        channel_to_encoder_dim={"a": 4, "b": 6}, encoding_projection_dim=5
    )
    a = torch.randn(3, 4)
    b = torch.randn(3, 6)
    with torch.no_grad():
        want = ref({"a": a, "b": b}).numpy()
    got = np.asarray(model.apply(
        params, {"a": jnp.asarray(a.numpy()), "b": jnp.asarray(b.numpy())}
    ))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_deepset_fusion_parity():
    torch.manual_seed(0)
    ref = TorchDeepsetFusion(
        {"a": 4, "b": 4}, mlp=TorchMLP(4, 3, [8]), pooling_function=torch.sum
    ).eval()
    params = deepset_fusion_params_from_torch(ref.state_dict())
    model = DeepsetFusionModule(
        channel_to_encoder_dim={"a": 4, "b": 4},
        mlp=MLP(in_dim=4, out_dim=3, hidden_dims=[8], dropout=0.0),
        pooling_function=jnp.sum,
    )
    a = torch.randn(3, 4)
    b = torch.randn(3, 4)
    with torch.no_grad():
        want = ref({"a": a, "b": b}).numpy()
    got = np.asarray(model.apply(
        params, {"a": jnp.asarray(a.numpy()), "b": jnp.asarray(b.numpy())}
    ))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
