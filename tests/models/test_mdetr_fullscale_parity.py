"""Full-scale MDETR joint-transformer parity: the real config (d_model 256,
8 heads, 6 encoder + 6 decoder layers, ffn 2048 — reference
models/mdetr/transformer.py defaults / model.py:176 mdetr_resnet101)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_tpu.models.mdetr.transformer import MDETRTransformer  # noqa: E402
from multimodal_tpu.utils.checkpoint import (  # noqa: E402
    mdetr_transformer_params_from_torch,
)

from tests.reference_compat import import_reference  # noqa: E402

import_reference()

from torchmultimodal.models.mdetr.transformer import (  # noqa: E402
    MDETRTransformer as TorchMDETRTransformer,
)

CFG = dict(d_model=256, num_heads=8, num_encoder_layers=6, num_decoder_layers=6,
           dim_feedforward=2048, dropout=0.0)


@pytest.mark.slow
def test_mdetr_transformer_fullscale_parity():
    torch.manual_seed(9)
    ref = TorchMDETRTransformer(**CFG).eval()
    params = mdetr_transformer_params_from_torch(
        ref.state_dict(), num_encoder_layers=6, num_decoder_layers=6
    )
    model = MDETRTransformer(**CFG)

    b, fh, fw, d, nq, tlen = 2, 16, 20, 256, 100, 24
    img = torch.randn(b, d, fh, fw)
    pos = torch.randn(b, d, fh, fw)
    img_mask = torch.zeros(b, fh, fw, dtype=torch.bool)
    img_mask[1, :, 14:] = True  # padded columns on sample 1
    text = torch.randn(tlen, b, d)
    text_mask = torch.zeros(b, tlen, dtype=torch.bool)
    text_mask[0, 19:] = True
    query = torch.randn(nq, d)

    with torch.no_grad():
        want = ref(img, img_mask, query, pos, text, text_mask)

    got = jax.jit(model.apply)(
        params,
        jnp.asarray(img.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(img_mask.numpy()),
        jnp.asarray(query.numpy()),
        jnp.asarray(pos.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(text.permute(1, 0, 2).numpy()),
        jnp.asarray(text_mask.numpy()),
    )

    want_dec = want.decoder_hidden_states.numpy()
    got_dec = np.asarray(got.decoder_hidden_states)
    assert want_dec.shape == got_dec.shape
    np.testing.assert_allclose(got_dec, want_dec, atol=2e-3, rtol=1e-3)
