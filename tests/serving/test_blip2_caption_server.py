"""BLIP-2 captioning through the serving engine (per-request kv_prefix).

Correctness bar: served greedy captions must equal a standalone greedy
loop that uses ONLY the original BLIP2 module's teacher-forced forward
(``prediction_scores``) — the reference CLM semantics (query-KV-cached
image conditioning, ``models/blip2/blip2.py:132-138``) — per request,
across mixed images, slot reuse, and chunked prefill.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.models.albef.image_encoder import ALBEFVisionEncoder
from multimodal_tpu.models.blip2.blip2 import BLIP2
from multimodal_tpu.models.blip2.qformer_model import QformerForCLM
from multimodal_tpu.serving import Blip2CaptionServer, InferenceEngine, Request

DIM_Q = 24
VOCAB = 50
BOS = 49
N_QUERY = 4
IMG = 16


def _build():
    qformer = QformerForCLM(
        num_hidden_layers=2, dim_q=DIM_Q, dim_feedforward=48, num_heads=2,
        max_position_embeddings=32, vocab_size=VOCAB, query_length=N_QUERY,
        dim_kv=DIM_Q, cross_attention_freq=2,
    )
    vision = ALBEFVisionEncoder(
        image_size=IMG, patch_size=8, num_hidden_layers=2,
        num_attention_heads=2, hidden_size=DIM_Q, mlp_dim=48,
    )
    model = BLIP2(
        qformer=qformer, vision_encoder=vision, dim_q=DIM_Q,
        image_encoder_embedding_dim=DIM_Q, embedding_dim=8,
        num_query_token=N_QUERY, decoder_bos_token_id=BOS,
    )
    r = np.random.RandomState(0)
    image = jnp.asarray(r.rand(1, IMG, IMG, 3).astype(np.float32))
    ids = jnp.asarray(r.randint(1, 48, (1, 6), dtype=np.int32))
    variables = model.init(
        jax.random.PRNGKey(0), image, ids, jnp.ones((1, 6), jnp.int32)
    )
    return model, variables


def _images(n):
    return np.asarray(
        jax.random.uniform(jax.random.PRNGKey(11), (n, IMG, IMG, 3))
    )


def _ref_greedy(model, variables, image, prompt, max_new):
    """Greedy loop over the ORIGINAL model's teacher-forced forward: each
    step re-runs BLIP2.__call__ on the tokens so far and extends with the
    argmax of the last position's prediction scores."""
    toks = list(prompt)
    out = []
    for _ in range(max_new):
        ids = jnp.asarray([toks], jnp.int32)
        scores = model.apply(
            variables, jnp.asarray(image)[None], ids,
            jnp.ones_like(ids),
        ).prediction_scores
        nxt = int(jnp.argmax(scores[0, -1]))
        out.append(nxt)
        toks.append(nxt)
    return out


def test_prime_features_match_model():
    """prime()'s ITC image features == BLIP2.__call__'s image_features."""
    model, variables = _build()
    image = _images(2)
    ids = jnp.ones((2, 4), jnp.int32)
    ref = model.apply(
        variables, jnp.asarray(image), ids, jnp.ones_like(ids)
    ).image_features
    server = Blip2CaptionServer(model, variables, n_slots=1)
    _, feats = server.prime(image)
    np.testing.assert_allclose(feats, np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("decode_steps", [1, 3])
def test_served_captions_match_reference_greedy(decode_steps):
    model, variables = _build()
    n_req = 4
    images = _images(n_req)
    server = Blip2CaptionServer(
        model, variables, n_slots=2, max_text_len=16,
        cache_dtype=jnp.float32, decode_steps=decode_steps,
    )
    kvs, _ = server.prime(images)
    # prompts start with the BOS convention (reference blip2.py:126-127)
    prompts = [[BOS], [BOS, 5], [BOS, 7, 9], [BOS, 2]]
    for i in range(n_req):
        server.submit(
            prompts[i], kv_prefix=kvs[i], request_id=i, max_new_tokens=5
        )
    outs = {o.request_id: o for o in server.run()}
    assert len(outs) == n_req
    for i in range(n_req):
        expected = _ref_greedy(model, variables, images[i], prompts[i], 5)
        assert outs[i].tokens == expected, f"request {i}"


def test_chunked_prefill_and_slot_reuse():
    model, variables = _build()
    images = _images(5)
    server = Blip2CaptionServer(
        model, variables, n_slots=2, max_text_len=16,
        cache_dtype=jnp.float32, prefill_chunk=2,
    )
    kvs, _ = server.prime(images)
    prompts = [[BOS] + [3 + i, 5, 7, 2, 11][: 1 + i % 4] for i in range(5)]
    for i in range(5):
        server.submit(
            prompts[i], kv_prefix=kvs[i], request_id=i, max_new_tokens=4
        )
    outs = {o.request_id: o for o in server.run()}
    assert len(outs) == 5
    for i in range(5):
        expected = _ref_greedy(model, variables, images[i], prompts[i], 4)
        assert outs[i].tokens == expected, f"request {i}"


def test_single_image_submit_and_budget():
    model, variables = _build()
    server = Blip2CaptionServer(model, variables, n_slots=1, max_text_len=8)
    img = _images(1)[0]
    with pytest.raises(ValueError, match="exactly one"):
        server.submit([BOS])
    with pytest.raises(ValueError, match="max_text_len"):
        server.submit([BOS], image=img, max_new_tokens=8)
    server.submit([BOS], image=img, request_id=0, max_new_tokens=3)
    outs = server.run()
    assert len(outs) == 1 and len(outs[0].tokens) == 3
    expected = _ref_greedy(model, variables, img, [BOS], 3)
    assert outs[0].tokens == expected


def test_engine_kv_prefix_validation():
    model, variables = _build()
    server = Blip2CaptionServer(model, variables, n_slots=1, max_text_len=8)
    engine = server.engine
    kvs, _ = server.prime(_images(1))
    with pytest.raises(ValueError, match="kv_prefix is required"):
        engine.submit(Request([1], max_new_tokens=1))
    bad = tuple((k[:, :-1], v[:, :-1]) for k, v in kvs[0])
    with pytest.raises(ValueError, match="shape"):
        engine.submit(Request([1], max_new_tokens=1, kv_prefix=bad))
    with pytest.raises(ValueError, match="layers"):
        engine.submit(
            Request([1], max_new_tokens=1, kv_prefix=kvs[0][:1])
        )
    with pytest.raises(ValueError, match="registered prefixes"):
        engine.register_prefix("sys", [1, 2])
    # a plain engine rejects kv_prefix requests
    from multimodal_tpu.examples.long_context.model import LongContextLM

    lm = LongContextLM(
        vocab_size=16, max_seq_len=8, n_layer=1, d_model=8, n_head=1,
        dim_feedforward=16,
    )
    lm_params = lm.init(jax.random.PRNGKey(0), jnp.zeros((1, 2), jnp.int32))
    plain = InferenceEngine(
        lm, lm_params, n_slots=1, max_len=8, cache_dtype=jnp.float32
    )
    with pytest.raises(ValueError, match="kv_prefix is required"):
        plain.submit(Request([1], max_new_tokens=1, kv_prefix=kvs[0]))
