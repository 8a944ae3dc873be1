"""Tests for example-level models: CNN-LSTM, ALBEF tasks, diffusion adapters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from multimodal_tpu.diffusion_labs.adapters.conditioning import (
    InpaintingAdapter,
    SuperResolutionAdapter,
)
from multimodal_tpu.diffusion_labs.utils import DiffusionOutput
from multimodal_tpu.examples.albef.model import (
    ALBEFDecoder,
    ALBEFModelForRetrieval,
    ALBEFModelForVQA,
    albef_retrieval_train_step,
)
from multimodal_tpu.examples.cnn_lstm.cnn_lstm import cnn_lstm_classifier
from multimodal_tpu.models.albef.model import (
    ALBEFModelWithSimilarity,
    init_albef_queues,
)

from tests.models.test_albef import small_albef
from tests.test_utils import rng


def test_cnn_lstm_classifier():
    model = cnn_lstm_classifier(num_classes=3, vocab_size=50)
    batch = {
        "image": jnp.ones((2, 32, 32, 3)),
        "text": jnp.ones((2, 7), jnp.int32),
    }
    params = model.init(rng(0), batch)
    out = model.apply(params, batch)
    assert out.shape == (2, 3)


def test_albef_decoder_and_vqa():
    albef = small_albef()
    decoder = ALBEFDecoder(
        vocab_size=60, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48, max_position_embeddings=16,
    )
    model = ALBEFModelForVQA(model=albef, decoder=decoder)
    r = np.random.RandomState(0)
    image = jnp.asarray(r.rand(2, 16, 16, 3).astype(np.float32))
    question = jnp.asarray(r.randint(1, 59, (2, 6), dtype=np.int32))
    q_atts = jnp.ones((2, 6), jnp.int32)
    answer = jnp.asarray(r.randint(1, 59, (2, 4), dtype=np.int32))
    a_atts = jnp.ones((2, 4), jnp.int32)
    params = model.init(rng(0), image, question, q_atts, answer, a_atts)
    loss = model.apply(params, image, question, q_atts, answer, a_atts)
    assert loss.shape == (2,)
    assert np.isfinite(np.asarray(loss)).all()


def test_albef_retrieval_train_step():
    albef = small_albef()
    sim = ALBEFModelWithSimilarity(
        albef_model=albef, vision_proj=nn.Dense(8), text_proj=nn.Dense(8),
        embed_size=8, queue_size=8,
    )
    module = ALBEFModelForRetrieval(model_with_similarity=sim, hidden_size=24)
    r = np.random.RandomState(0)
    image = jnp.asarray(r.rand(2, 16, 16, 3).astype(np.float32))
    text = jnp.asarray(r.randint(1, 59, (2, 6), dtype=np.int32))
    atts = jnp.ones((2, 6), jnp.int32)

    # init: materialize similarity submodule + itm head
    def init_fn(mdl):
        img, txt, mm, feats = mdl.model_with_similarity(image, text, atts)
        return mdl.itm_scores(mm[:, 0])

    variables = module.init(rng(0), method=init_fn)
    variables_m = jax.tree_util.tree_map(jnp.copy, variables)
    queues = init_albef_queues(rng(1), 8, 8)
    loss, new_m, new_q = albef_retrieval_train_step(
        module, variables, variables_m, queues, image, text, atts,
        jnp.asarray([3, 5]), rng(2), alpha=0.4,
    )
    assert np.isfinite(float(loss))
    assert int(new_q.queue_ptr) == 2


class _EpsModel(nn.Module):
    out_channels: int = 3

    @nn.compact
    def __call__(self, x, t, c=None):
        h = nn.Conv(self.out_channels, (1, 1))(x)
        return DiffusionOutput(prediction=h)


def test_conditioning_adapters():
    x = jnp.ones((1, 8, 8, 3))
    t = jnp.asarray([1])

    inpaint = InpaintingAdapter(model=_EpsModel())
    cond = {"masked": jnp.zeros_like(x), "mask": jnp.ones((1, 8, 8, 1))}
    params = inpaint.init(rng(0), x, t, cond)
    out = inpaint.apply(params, x, t, cond)
    assert out.prediction.shape == x.shape

    sr = SuperResolutionAdapter(model=_EpsModel())
    cond2 = {"low_res": jnp.ones((1, 4, 4, 3))}
    params2 = sr.init(rng(1), x, t, cond2)
    out2 = sr.apply(params2, x, t, cond2)
    assert out2.prediction.shape == x.shape
