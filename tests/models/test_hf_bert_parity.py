"""BERT text-tower parity vs the REAL HuggingFace BertModel at the full
bert-base config (12L/768/12H) — proves real bert-base-uncased checkpoints
load into `bert_text_encoder` via `hf_bert_params_from_torch`."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_tpu.modules.encoders.bert_text_encoder import (  # noqa: E402
    bert_text_encoder,
)
from multimodal_tpu.utils.checkpoint import hf_bert_params_from_torch  # noqa: E402


@pytest.mark.slow
def test_bert_text_encoder_matches_real_hf_bert():
    from transformers import BertConfig, BertModel

    torch.manual_seed(1)
    config = BertConfig()  # bert-base: 12 layers, 768 hidden, 12 heads
    ref = BertModel(config).eval()

    model = bert_text_encoder(
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072, vocab_size=config.vocab_size,
        max_position_embeddings=config.max_position_embeddings,
    )
    variables = hf_bert_params_from_torch(ref.state_dict(), n_layers=12)

    rng = np.random.RandomState(0)
    ids = rng.randint(103, config.vocab_size, (2, 14)).astype(np.int64)
    tt = rng.randint(0, 2, (2, 14)).astype(np.int64)
    mask = np.ones((2, 14), np.int64)
    mask[0, 9:] = 0

    with torch.no_grad():
        want = ref(
            input_ids=torch.as_tensor(ids),
            attention_mask=torch.as_tensor(mask),
            token_type_ids=torch.as_tensor(tt),
        ).last_hidden_state.numpy()

    got = np.asarray(
        jax.jit(
            lambda v, i, m, t: model.apply(
                v, input_ids=i, attention_mask=m, token_type_ids=t
            )
        )(
            variables,
            jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(np.int32)),
            jnp.asarray(tt.astype(np.int32)),
        ).last_hidden_state
    )
    for b in range(2):
        valid = mask[b].astype(bool)
        np.testing.assert_allclose(
            got[b, valid], want[b, valid], rtol=1e-4, atol=1e-4
        )
