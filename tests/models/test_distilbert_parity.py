"""MUGEN VideoCLIP text tower parity vs the REAL HuggingFace
DistilBertModel (the reference wraps it directly —
examples/mugen/retrieval/video_clip.py:43). Uses a randomly initialized
DistilBERT at the real config (6L/768/12H) so the converter is exercised at
full scale against the genuine upstream implementation, not a re-creation."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_tpu.modules.encoders.bert_text_encoder import (  # noqa: E402
    bert_text_encoder,
)
from multimodal_tpu.utils.checkpoint import distilbert_params_from_torch  # noqa: E402


@pytest.mark.slow
def test_mugen_text_tower_matches_real_distilbert():
    from transformers import DistilBertConfig, DistilBertModel

    torch.manual_seed(0)
    config = DistilBertConfig()  # 6 layers, 768 hidden, 12 heads, 3072 ffn
    ref = DistilBertModel(config).eval()

    model = bert_text_encoder(
        hidden_size=768, num_hidden_layers=6, num_attention_heads=12,
        intermediate_size=3072, vocab_size=config.vocab_size,
        max_position_embeddings=config.max_position_embeddings,
    )
    variables = distilbert_params_from_torch(ref.state_dict(), n_layers=6)

    rng = np.random.RandomState(0)
    ids = rng.randint(103, config.vocab_size, (2, 16)).astype(np.int64)
    mask = np.ones((2, 16), np.int64)
    mask[1, 11:] = 0

    with torch.no_grad():
        want = ref(
            input_ids=torch.as_tensor(ids), attention_mask=torch.as_tensor(mask)
        ).last_hidden_state.numpy()

    got = np.asarray(
        jax.jit(lambda v, i, m: model.apply(v, input_ids=i, attention_mask=m))(
            variables, jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(np.int32)),
        ).last_hidden_state
    )
    # padded positions differ by design (DistilBERT still computes them);
    # compare valid positions only
    for b in range(2):
        valid = mask[b].astype(bool)
        np.testing.assert_allclose(
            got[b, valid], want[b, valid], rtol=1e-4, atol=1e-4
        )
