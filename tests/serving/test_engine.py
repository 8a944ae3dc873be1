"""Serving engine: fixed-buffer per-slot KV cache + continuous batching.

The correctness bar: whatever interleaving of admissions, slot reuse, and
lockstep decode ticks the engine runs, each request's greedy output must
equal the output of a standalone full-forward greedy loop over the same
params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.examples.long_context.model import LongContextLM
from multimodal_tpu.modules.layers.multi_head_attention import (
    MultiHeadAttentionWithCache,
)
from multimodal_tpu.serving import EmbeddingServer, InferenceEngine, Request


def _tiny_lm(max_seq_len=32, vocab=50):
    model = LongContextLM(
        vocab_size=vocab, max_seq_len=max_seq_len, n_layer=2, d_model=32,
        n_head=2, dim_feedforward=64,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32)
    )
    return model, params


def _ref_greedy(model, params, prompt, max_new, eos_id=None):
    toks = list(prompt)
    out = []
    for _ in range(max_new):
        logits = model.apply(params, jnp.asarray([toks], jnp.int32))
        nxt = int(jnp.argmax(logits[0, -1]))
        out.append(nxt)
        toks.append(nxt)
        if eos_id is not None and nxt == eos_id:
            break
    return out


def test_fixed_cache_write_matches_concat_decode():
    """Scalar cache_index fixed-buffer decode == concat-cache decode == full
    causal forward, token by token."""
    mha = MultiHeadAttentionWithCache(dim_q=16, dim_kv=16, num_heads=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    params = mha.init(jax.random.PRNGKey(2), x, x, x)

    full = mha.apply(params, x, x, x, is_causal=True)

    max_len = 6
    cache = (jnp.zeros((2, 2, max_len, 8)), jnp.zeros((2, 2, max_len, 8)))
    outs = []
    for t in range(6):
        tok = x[:, t : t + 1]
        mask = (jnp.arange(max_len) <= t)[None, None, None, :]
        res = mha.apply(
            params, tok, tok, tok, attn_mask=mask, past_key_value=cache,
            use_cache=True, cache_index=jnp.asarray(t),
        )
        cache = res.past_key_value
        assert cache[0].shape == (2, 2, max_len, 8)  # fixed size, not grown
        outs.append(res.attn_output)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs, axis=1)), np.asarray(full), atol=1e-5
    )


def test_per_row_cache_index_writes_each_row_at_its_own_offset():
    """A (batch,) cache_index vector scatters row b's kv at position idx[b]."""
    mha = MultiHeadAttentionWithCache(dim_q=16, dim_kv=16, num_heads=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 1, 16))
    params = mha.init(jax.random.PRNGKey(4), x, x, x)
    cache = (jnp.zeros((3, 2, 8, 8)), jnp.zeros((3, 2, 8, 8)))
    idx = jnp.asarray([0, 3, 7])
    mask = (jnp.arange(8)[None, :] <= idx[:, None])[:, None, None, :]
    res = mha.apply(
        params, x, x, x, attn_mask=mask, past_key_value=cache,
        use_cache=True, cache_index=idx,
    )
    k = np.asarray(res.past_key_value[0])
    for b, i in enumerate([0, 3, 7]):
        assert np.abs(k[b, :, i]).sum() > 0, f"row {b} not written at {i}"
        untouched = [j for j in range(8) if j != i]
        assert np.abs(k[b][:, untouched]).sum() == 0


@pytest.mark.parametrize("decode_steps", [1, 3])
def test_engine_greedy_matches_full_forward_mixed_lengths(decode_steps):
    model, params = _tiny_lm()
    engine = InferenceEngine(
        model, params, n_slots=3, max_len=32, cache_dtype=jnp.float32,
        decode_steps=decode_steps,
    )
    prompts = [[1, 2, 3], [4, 5], [6, 7, 8, 9, 10], [11]]
    for i, p in enumerate(prompts):
        engine.submit(Request(p, max_new_tokens=6, request_id=i))
    outs = {o.request_id: o for o in engine.run()}
    assert len(outs) == 4
    for i, p in enumerate(prompts):
        expected = _ref_greedy(model, params, p, 6)
        assert outs[i].tokens == expected, f"request {i}"
        assert outs[i].finish_reason == "length"


def test_engine_slot_reuse_more_requests_than_slots():
    model, params = _tiny_lm()
    engine = InferenceEngine(
        model, params, n_slots=2, max_len=32, cache_dtype=jnp.float32,
    )
    prompts = [[i + 1, i + 2] for i in range(7)]
    for i, p in enumerate(prompts):
        engine.submit(Request(p, max_new_tokens=4, request_id=i))
    outs = {o.request_id: o for o in engine.run()}
    assert len(outs) == 7
    for i, p in enumerate(prompts):
        assert outs[i].tokens == _ref_greedy(model, params, p, 4)


def test_engine_eos_frees_slot_early():
    model, params = _tiny_lm()
    # find the token the model emits greedily after [1, 2] and use it as eos
    first = _ref_greedy(model, params, [1, 2], 1)[0]
    engine = InferenceEngine(
        model, params, n_slots=1, max_len=32, cache_dtype=jnp.float32,
    )
    engine.submit(Request([1, 2], max_new_tokens=8, eos_id=first, request_id=0))
    engine.submit(Request([3, 4], max_new_tokens=2, request_id=1))
    outs = {o.request_id: o for o in engine.run()}
    assert outs[0].finish_reason == "eos"
    assert outs[0].tokens == [first]
    assert outs[1].tokens == _ref_greedy(model, params, [3, 4], 2)


def test_engine_decode_ticks_are_batched():
    """Continuous batching actually shares ticks: serving K same-length
    requests together takes far fewer decode ticks than serially."""
    model, params = _tiny_lm()
    engine = InferenceEngine(
        model, params, n_slots=4, max_len=32, cache_dtype=jnp.float32,
        decode_steps=1,
    )
    for i in range(4):
        engine.submit(Request([1, 2, 3], max_new_tokens=5, request_id=i))
    engine.run()
    # 4 requests x 5 tokens; first token comes from prefill, so 4 ticks of
    # lockstep decode serve all four requests
    assert engine.ticks == 4


def test_engine_temperature_zero_vector_mixes_with_sampling():
    """Greedy and sampling requests can share a tick; greedy rows stay
    deterministic."""
    model, params = _tiny_lm()
    engine = InferenceEngine(
        model, params, n_slots=2, max_len=32, cache_dtype=jnp.float32,
        top_k=5, seed=7,
    )
    engine.submit(Request([1, 2, 3], max_new_tokens=5, request_id="greedy"))
    engine.submit(
        Request([4, 5, 6], max_new_tokens=5, temperature=1.0,
                request_id="sampled")
    )
    outs = {o.request_id: o for o in engine.run()}
    assert outs["greedy"].tokens == _ref_greedy(model, params, [1, 2, 3], 5)
    assert len(outs["sampled"].tokens) == 5


def test_engine_rejects_oversized_request():
    model, params = _tiny_lm()
    engine = InferenceEngine(model, params, n_slots=1, max_len=8)
    with pytest.raises(ValueError):
        engine.submit(Request([1, 2, 3, 4], max_new_tokens=5))


def test_embedding_server_bucketing_matches_direct():
    model, params = _tiny_lm()

    def embed(p, tokens):
        logits = model.apply(p, tokens)
        return logits.mean(axis=1)

    server = EmbeddingServer(embed, params, max_batch=8)
    for n in (1, 3, 8, 17):
        tokens = np.arange(n * 4, dtype=np.int32).reshape(n, 4) % 50
        got = server.encode(tokens)
        want = np.asarray(embed(params, jnp.asarray(tokens)))
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert got.shape[0] == n


def test_engine_serves_tp_sharded_model():
    """Production-scale serving: the engine drives a model whose weights are
    tensor-parallel sharded over a tp mesh axis — GSPMD parallelizes the
    decode tick; tokens match the unsharded engine."""
    from multimodal_tpu.parallel.mesh import create_mesh
    from multimodal_tpu.parallel.sharding import tp_sharding

    model, params = _tiny_lm()
    prompts = [[1, 2, 3], [4, 5]]

    def run(engine):
        for i, p in enumerate(prompts):
            engine.submit(Request(p, max_new_tokens=6, request_id=i))
        return {o.request_id: o.tokens for o in engine.run()}

    want = run(InferenceEngine(
        model, params, n_slots=2, max_len=32, cache_dtype=jnp.float32,
    ))

    mesh = create_mesh(dp=2, fsdp=1, tp=4)
    shardings = tp_sharding(params, mesh, min_weight_size=0)
    p_sharded = jax.tree_util.tree_map(jax.device_put, params, shardings)
    with jax.set_mesh(mesh):
        got = run(InferenceEngine(
            model, p_sharded, n_slots=2, max_len=32,
            cache_dtype=jnp.float32,
        ))
    assert got == want


def test_embedding_server_clip_vit_tower():
    """The embedding server fronts a real CLIP ViT tower."""
    from multimodal_tpu.models.clip.image_encoder import CLIPViTEncoder

    encoder = CLIPViTEncoder(
        image_size=32, patch_size=8, layers=2, heads=2, width=32,
        embedding_dim=16,
    )
    images = np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (11, 32, 32, 3))
    )
    params = encoder.init(jax.random.PRNGKey(1), jnp.asarray(images[:1]))

    server = EmbeddingServer(
        lambda p, x: encoder.apply(p, x), params, max_batch=4
    )
    got = server.encode(images)
    want = np.asarray(encoder.apply(params, jnp.asarray(images)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_engine_streaming_callback():
    """on_token streams tokens out as they are collected."""
    model, params = _tiny_lm()
    engine = InferenceEngine(
        model, params, n_slots=1, max_len=32, cache_dtype=jnp.float32,
    )
    streamed = []
    engine.submit(
        Request([1, 2, 3], max_new_tokens=5, on_token=streamed.append)
    )
    outs = engine.run()
    assert streamed == outs[0].tokens == _ref_greedy(model, params, [1, 2, 3], 5)


def test_engine_fuzz_random_schedule():
    """Property test: whatever the arrival schedule, lengths, and slot
    contention, every request's greedy output equals the standalone greedy
    loop."""
    rng = np.random.default_rng(0)
    model, params = _tiny_lm()
    engine = InferenceEngine(
        model, params, n_slots=3, max_len=32, cache_dtype=jnp.float32,
        decode_steps=2, prefill_batch=2,
    )
    reqs = []
    for i in range(12):
        plen = int(rng.integers(1, 9))
        prompt = rng.integers(1, 50, plen).tolist()
        reqs.append(Request(prompt, int(rng.integers(1, 7)), request_id=i))
    # staggered arrivals: a few requests per engine step
    pending = list(reqs)
    while pending or any(not s.free for s in engine._slots) or engine._queue:
        for _ in range(int(rng.integers(0, 3))):
            if pending:
                engine.submit(pending.pop())
        engine.step()
    outs = {o.request_id: o for o in engine._done}
    assert len(outs) == 12
    for r in reqs:
        want = _ref_greedy(model, params, r.prompt, r.max_new_tokens)
        assert outs[r.request_id].tokens == want, r.request_id


def test_engine_prefix_caching_matches_full_prompt():
    """Requests sharing a registered prefix decode exactly as if the full
    (prefix + suffix) prompt had been prefilled."""
    model, params = _tiny_lm()
    prefix = [9, 8, 7, 6]
    engine = InferenceEngine(
        model, params, n_slots=2, max_len=32, cache_dtype=jnp.float32,
    )
    engine.register_prefix("sys", prefix)
    suffixes = [[1, 2, 3], [4, 5], [1]]
    for i, s in enumerate(suffixes):
        engine.submit(
            Request(s, max_new_tokens=5, request_id=i, prefix="sys")
        )
    # a no-prefix request rides the same engine
    engine.submit(Request([2, 2], max_new_tokens=5, request_id="plain"))
    outs = {o.request_id: o for o in engine.run()}
    for i, s in enumerate(suffixes):
        want = _ref_greedy(model, params, prefix + s, 5)
        assert outs[i].tokens == want, f"suffix {i}"
        assert outs[i].prompt_len == len(prefix) + len(s)
    assert outs["plain"].tokens == _ref_greedy(model, params, [2, 2], 5)


def test_engine_prefix_validation():
    model, params = _tiny_lm()
    engine = InferenceEngine(model, params, n_slots=1, max_len=16)
    with pytest.raises(ValueError):
        engine.submit(Request([1], max_new_tokens=2, prefix="nope"))
    engine.register_prefix("sys", [1] * 10)
    with pytest.raises(ValueError):  # 10 + 3 + 5 > 16
        engine.submit(Request([1, 2, 3], max_new_tokens=5, prefix="sys"))
