"""BLIP-2 parity vs the PyTorch reference (converted random weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from multimodal_tpu.models.blip2.blip2 import BLIP2
from multimodal_tpu.models.blip2.qformer_model import QformerForCLM
from multimodal_tpu.modules.encoders.vision_transformer import vision_transformer
from multimodal_tpu.utils.checkpoint import blip2_params_from_torch

from tests.reference_compat import import_reference

import_reference()

from torchmultimodal.models.blip2.blip2 import BLIP2 as TorchBLIP2  # noqa: E402
from torchmultimodal.models.blip2.qformer_model import (  # noqa: E402
    QformerForCLM as TorchQformerForCLM,
)
from torchmultimodal.modules.encoders.vision_transformer import (  # noqa: E402
    vision_transformer as torch_vision_transformer,
)

VIT = dict(patch_size=8, hidden_dim=32, dim_feedforward=64, n_layer=2, n_head=2,
           image_size=32, include_cls_embed=True, final_layer_norm_eps=1e-5)
QF = dict(dim_q=32, dim_kv=32, dim_feedforward=64, num_heads=2, attn_dropout=0.0,
          dropout=0.0, num_hidden_layers=2, max_position_embeddings=16,
          vocab_size=50, query_length=4)
TOP = dict(dim_q=32, image_encoder_embedding_dim=32, embedding_dim=16,
           num_query_token=4, decoder_bos_token_id=2)


def _cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_blip2_parity_tiny():
    torch.manual_seed(0)
    ref = TorchBLIP2(
        qformer=TorchQformerForCLM(**QF),
        vision_encoder=torch_vision_transformer(**VIT),
        **TOP,
    ).eval()
    params = blip2_params_from_torch(ref.state_dict(), vision_layers=2, qformer_layers=2)
    model = BLIP2(
        qformer=QformerForCLM(**QF),
        vision_encoder=vision_transformer(**VIT),
        **TOP,
    )

    img = torch.randn(2, 3, 32, 32)
    ids = torch.randint(3, 49, (2, 6))
    mask = torch.ones(2, 6)
    with torch.no_grad():
        ref_out = ref(img, ids, mask)

    out = model.apply(
        params,
        jnp.asarray(img.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(ids.numpy()),
        jnp.asarray(mask.numpy()),
    )

    pairs = [
        ("image_embeddings", ref_out.image_embeddings, out.image_embeddings),
        ("image_features", ref_out.image_features, out.image_features),
        ("image_qformer_output", ref_out.image_qformer_output, out.image_qformer_output),
        ("text_features", ref_out.text_features, out.text_features),
        ("prediction_scores", ref_out.prediction_scores, out.prediction_scores),
    ]
    for name, want, got in pairs:
        want = want.numpy()
        cos = _cosine(want, got)
        assert cos > 0.999, f"{name} cosine {cos}"
        np.testing.assert_allclose(
            np.asarray(got), want, atol=5e-4, rtol=1e-3, err_msg=name,
        )
