"""CoCa captioning through the serving engine.

Two-level correctness:
  1. Adapter parity: the serving adapter's full-forward logits must equal
     the teacher-forced captioning logits of ``CoCaModel.__call__``
     (``multimodal_embeddings``) for the same image+text — the adapter is
     a re-wiring of the same params, not a new model.
  2. Engine equality: served greedy captions (mixed images in flight,
     slot reuse) == a standalone greedy loop over adapter full forwards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.models.coca.coca_model import coca_vit
from multimodal_tpu.serving import CoCaCaptionServer

VOCAB = 60
POSITIONS = 12  # num_text_positions; caption budget = 11
IMG = 32


def _tiny_coca(cascaded=True):
    model = coca_vit(
        vision_patch_size=8,
        vision_dim_feedforward=64,
        vision_n_layer=2,
        vision_n_head=2,
        vocab_size=VOCAB,
        num_text_positions=POSITIONS,
        text_hidden_dim=32,
        text_n_layer=2,
        text_n_head=2,
        text_dim_feedforward=64,
        text_output_dim=32,
        fusion_n_layer=2,
        fusion_n_head=2,
        fusion_dim_feedforward=64,
        pooler_input_embed_dim=48,
        pooler_output_embed_dim=32,
        pooler_n_head=2,
        image_size=IMG,
        multimodal_output_projection_dim=VOCAB,
        cascaded_pooler=cascaded,
        pooler_n_queries=6,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, IMG, IMG, 3)),
        jnp.ones((1, POSITIONS), jnp.int32),
    )
    return model, variables


def _images(n):
    return jax.random.uniform(jax.random.PRNGKey(7), (n, IMG, IMG, 3))


def _ref_greedy(server, prompt, image_tokens, max_new):
    """Standalone greedy loop: full adapter forward per step."""
    toks = list(prompt)
    out = []
    for _ in range(max_new):
        logits = server.adapter.apply(
            server.variables,
            jnp.asarray([toks], jnp.int32),
            conditioning=jnp.asarray(image_tokens, jnp.float32)[None],
        )
        nxt = int(jnp.argmax(logits[0, -1]))
        out.append(nxt)
        toks.append(nxt)
    return out


@pytest.mark.parametrize("cascaded", [True, False])
def test_adapter_matches_model_captioning_logits(cascaded):
    """Full-forward adapter logits == CoCaModel.multimodal_embeddings
    (teacher-forced captioning path) on pad-free text."""
    model, variables = _tiny_coca(cascaded)
    images = _images(2)
    # pad-free (no pad_idx=0 tokens): the adapter's pure-causal mask then
    # matches the model's causal+key-padding mask exactly
    texts = jax.random.randint(
        jax.random.PRNGKey(3), (2, POSITIONS), 1, VOCAB
    )
    ref = model.apply(variables, images, texts).multimodal_embeddings

    server = CoCaCaptionServer(model, variables, n_slots=2)
    cap_tokens, _ = server.encode(images)
    got = server.adapter.apply(
        variables,
        texts[:, : POSITIONS - 1],
        conditioning=jnp.asarray(cap_tokens),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


def test_encode_contrastive_matches_model():
    model, variables = _tiny_coca()
    images = _images(2)
    texts = jax.random.randint(jax.random.PRNGKey(4), (2, POSITIONS), 1, VOCAB)
    ref = model.apply(variables, images, texts).image_pooled_output
    server = CoCaCaptionServer(model, variables, n_slots=1)
    _, contrastive = server.encode(images)
    np.testing.assert_allclose(
        contrastive, np.asarray(ref), rtol=1e-5, atol=1e-6
    )


def test_served_captions_match_reference_greedy():
    """Mixed images in flight + slot reuse: each request's caption equals
    its standalone greedy decode."""
    model, variables = _tiny_coca()
    n_req = 5
    images = _images(n_req)
    server = CoCaCaptionServer(
        model, variables, n_slots=2, cache_dtype=jnp.float32
    )
    cap_tokens, _ = server.encode(images)
    prompts = [[1 + i, 2 + i] for i in range(n_req)]
    for i in range(n_req):
        server.submit(
            prompts[i], image_tokens=cap_tokens[i], request_id=i,
            max_new_tokens=6,
        )
    outs = {o.request_id: o for o in server.run()}
    assert len(outs) == n_req
    for i in range(n_req):
        expected = _ref_greedy(server, prompts[i], cap_tokens[i], 6)
        assert outs[i].tokens == expected, f"request {i}"


def test_submit_validation():
    model, variables = _tiny_coca()
    server = CoCaCaptionServer(model, variables, n_slots=1)
    img = np.asarray(_images(1)[0])
    with pytest.raises(ValueError, match="exactly one"):
        server.submit([1, 2], request_id=0)
    with pytest.raises(ValueError, match="position table"):
        server.submit([1, 2], image=img, max_new_tokens=POSITIONS)
    # single-image convenience path: encode inside submit
    server.submit([1, 2], image=img, request_id=0, max_new_tokens=3)
    outs = server.run()
    assert len(outs) == 1 and len(outs[0].tokens) == 3
