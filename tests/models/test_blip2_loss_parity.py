"""BLIP-2 stage-1 ITC/ITG loss parity vs the PyTorch reference.

ITM involves multinomial hard-negative sampling (RNG not alignable across
frameworks), so it's exercised by behavioral tests instead; ITC and ITG are
deterministic and compared exactly here through converted BLIP-2 weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from multimodal_tpu.models.blip2.blip2 import BLIP2
from multimodal_tpu.models.blip2.qformer_model import QformerForCLM
from multimodal_tpu.modules.encoders.vision_transformer import vision_transformer
from multimodal_tpu.modules.losses.blip2_losses import (
    compute_image_text_similarity,
    itc_loss,
    itg_loss,
)
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
from torchmultimodal.modules.losses.blip2_losses import Blip2Phase1Loss  # noqa: E402

VIT = dict(patch_size=8, hidden_dim=32, dim_feedforward=64, n_layer=2, n_head=2,
           image_size=32, include_cls_embed=True, final_layer_norm_eps=1e-5)
QF = dict(dim_q=32, dim_kv=32, dim_feedforward=64, num_heads=2, attn_dropout=0.0,
          dropout=0.0, num_hidden_layers=2, max_position_embeddings=16,
          vocab_size=50, query_length=4)
TOP = dict(dim_q=32, image_encoder_embedding_dim=32, embedding_dim=16,
           num_query_token=4, decoder_bos_token_id=2)


@pytest.mark.parametrize("part", ["itc", "itg"])
def test_blip2_stage1_loss_parity(part):
    torch.manual_seed(0)
    ref = TorchBLIP2(
        qformer=TorchQformerForCLM(**QF),
        vision_encoder=torch_vision_transformer(**VIT),
        **TOP,
    ).eval()
    ref_loss = Blip2Phase1Loss(
        dim_q=32, enable_itc=(part == "itc"), enable_itm=False,
        enable_itg=(part == "itg"),
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
        t_out = ref(img, ids, mask)
        want = ref_loss(
            model_output=t_out, blip2=ref, input_ids=ids, attention_mask=mask
        )
    want_val = float(
        want.image_text_contrastive_loss if part == "itc"
        else want.image_captioning_loss
    )

    out = model.apply(
        params,
        jnp.asarray(img.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(ids.numpy()),
        jnp.asarray(mask.numpy()),
    )
    if part == "itc":
        sim_i2t, sim_t2i = compute_image_text_similarity(
            out.image_features, out.text_features, temp=jnp.asarray(0.07)
        )
        got = float(itc_loss(sim_i2t, sim_t2i, label_smoothing=0.1))
    else:
        got = float(itg_loss(
            jnp.asarray(ids.numpy()), out.prediction_scores,
            decoder_bos_token_id=2, pad_token_id=0,
            vocab_size=50, label_smoothing=0.1,
        ))
    assert got == pytest.approx(want_val, rel=1e-4), (part, got, want_val)
