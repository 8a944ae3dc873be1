"""VideoGPT (MultimodalGPT) parity vs the PyTorch reference."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from multimodal_tpu.models.video_gpt.model import video_gpt
from multimodal_tpu.utils.checkpoint import video_gpt_params_from_torch

from tests.reference_compat import import_reference

import_reference()

from torch import nn  # noqa: E402
from torchmultimodal.models.video_gpt.gpt import (  # noqa: E402
    MultimodalGPT,
    MultimodalTransformerDecoder,
    RightShift,
    TransformerDecoder,
    TransformerDecoderLayer,
)
from torchmultimodal.models.video_gpt.model import (  # noqa: E402
    video_vqvae as torch_video_vqvae,
)
from torchmultimodal.modules.layers.attention import SelfAttention  # noqa: E402
from torchmultimodal.modules.layers.position_embedding import (  # noqa: E402
    BroadcastedPositionEmbedding,
)

VQ = dict(encoder_hidden_dim=16, n_res_layers=1, attn_hidden_dim=16,
          num_embeddings=8, embedding_dim=4, decoder_hidden_dim=16)
LATENT = (2, 8, 8)
D_MODEL = 30


def _torch_video_gpt():
    dec_layer = TransformerDecoderLayer(
        D_MODEL, 2, 0.0, attn_module=SelfAttention(attn_dropout=0.0)
    )
    mm = MultimodalTransformerDecoder(
        BroadcastedPositionEmbedding(LATENT, D_MODEL),
        BroadcastedPositionEmbedding(LATENT, D_MODEL),
        TransformerDecoder(dec_layer, 2),
        RightShift(D_MODEL),
    )
    return MultimodalGPT(
        d_model=D_MODEL, num_in_tokens=8, num_out_tokens=8, latent_shape=LATENT,
        in_tokenizer=torch_video_vqvae(**VQ), out_tokenizer=torch_video_vqvae(**VQ),
        mm_decoder=mm,
        in_projection=nn.Linear(4, D_MODEL, bias=False),
        out_projection=nn.Linear(4, D_MODEL, bias=False),
        use_gpt_init=True,
    )


def test_video_gpt_parity_tiny():
    torch.manual_seed(0)
    ref = _torch_video_gpt().eval()
    variables = video_gpt_params_from_torch(ref.state_dict(), num_decoder_layers=2)
    model = video_gpt(
        input_shape=(4, 16, 16), latent_shape=LATENT, d_model=D_MODEL, n_head=2,
        dropout=0.0, attn_dropout=0.0, num_decoder_layers=2, vqvae_kwargs=VQ,
    )

    n = int(np.prod(LATENT))
    rng = np.random.RandomState(0)
    in_tokens = rng.randint(0, 8, (2, n))
    out_tokens = rng.randint(0, 8, (2, n - 1))  # decoding partway

    # NOTE: the reference's `causal` flag only gates KV-cache behavior — it
    # never masks (attention.py:149-168); training passes attn_mask
    # explicitly. Our decoder materializes the tril mask when causal=True.
    # For a like-for-like comparison, hand both the explicit mask.
    total = 2 * n - 1
    tril = np.tril(np.ones((1, total, total), np.float32))

    with torch.no_grad():
        want = ref(
            in_tokens=torch.as_tensor(in_tokens),
            out_tokens=torch.as_tensor(out_tokens),
            attn_mask=torch.as_tensor(tril),
            right_shift=True,
        )
    got = model.apply(
        variables,
        in_tokens=jnp.asarray(in_tokens),
        out_tokens=jnp.asarray(out_tokens),
        attn_mask=jnp.asarray(tril),
        right_shift=True,
    )
    want_logits = want.decoder_output.last_hidden_states
    # reference returns hidden states; logits come from .logits() or fused —
    # compare whichever field carries the final activations
    got_logits = np.asarray(got.decoder_output.last_hidden_states)
    want_arr = want_logits.numpy()
    assert want_arr.shape == got_logits.shape, (want_arr.shape, got_logits.shape)
    np.testing.assert_allclose(got_logits, want_arr, atol=5e-4, rtol=1e-3)
