"""Grouped-query attention: kv-head sharing must match an explicit
repeated-head reference, the cache must actually shrink, and the serving
engine must decode GQA models exactly (incl. int8 + streaming)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.examples.long_context.model import LongContextLM
from multimodal_tpu.modules.layers.multi_head_attention import (
    MultiHeadAttentionWithCache,
)
from multimodal_tpu.serving import InferenceEngine, Request


def test_gqa_matches_repeated_head_reference():
    """num_kv_heads=2 with q heads 4 == full MHA whose k/v params are the
    GQA params tiled across each group."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    gqa = MultiHeadAttentionWithCache(
        dim_q=32, dim_kv=32, num_heads=4, num_kv_heads=2,
    )
    params = gqa.init(jax.random.PRNGKey(1), x, x, x)
    out = gqa.apply(params, x, x, x, is_causal=True)

    mha = MultiHeadAttentionWithCache(dim_q=32, dim_kv=32, num_heads=4)

    def tile(kernel):  # (32, 16) -> (32, 32): repeat each 8-wide head group
        heads = kernel.reshape(32, 2, 8)
        return jnp.repeat(heads, 2, axis=1).reshape(32, 32)

    p = jax.tree_util.tree_map(lambda a: a, params)
    for name in ("k_proj", "v_proj"):
        p["params"][name] = {
            "kernel": tile(params["params"][name]["kernel"]),
            "bias": jnp.repeat(
                params["params"][name]["bias"].reshape(2, 8), 2, axis=0
            ).reshape(32),
        }
    want = mha.apply(p, x, x, x, is_causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_gqa_cached_decode_matches_full():
    model = LongContextLM(
        vocab_size=64, max_seq_len=16, n_layer=2, d_model=32, n_head=4,
        n_kv_head=2,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    tokens = jnp.asarray([[5, 9, 2, 7, 1]])
    full = model.apply(params, tokens)

    cache = tuple(
        (jnp.zeros((1, 2, 8, 8)), jnp.zeros((1, 2, 8, 8)))  # kv heads = 2
        for _ in range(2)
    )
    outs = []
    for t in range(5):
        mask = (jnp.arange(8) <= t)[None, None, None, :]
        logits, cache = model.apply(
            params, tokens[:, t : t + 1], positions=jnp.asarray([[t]]),
            past_key_values=cache, cache_index=jnp.asarray([t]),
            attention_mask=mask, use_cache=True,
        )
        outs.append(logits)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs, axis=1)), np.asarray(full),
        atol=1e-4,
    )


@pytest.mark.parametrize("kw", [
    {},
    {"cache_dtype": "int8"},
    {"prefill_chunk": 4},
])
def test_engine_serves_gqa(kw):
    model = LongContextLM(
        vocab_size=64, max_seq_len=32, n_layer=2, d_model=32, n_head=4,
        n_kv_head=2,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    engine = InferenceEngine(model, params, n_slots=2, max_len=32, **kw)
    assert engine.cache[0][0].shape[1] == 2  # kv heads, not q heads

    engine.submit(Request([1, 2, 3, 4, 5, 6, 7], max_new_tokens=6,
                          request_id=0))
    got = engine.run()[0].tokens
    assert len(got) == 6

    if not kw:  # dense reference: incremental loop == engine
        cache = tuple(
            (jnp.zeros((1, 2, 32, 8)), jnp.zeros((1, 2, 32, 8)))
            for _ in range(2)
        )
        toks = [1, 2, 3, 4, 5, 6, 7]
        want = []
        logits = None
        for t in range(12):
            mask = (jnp.arange(32) <= t)[None, None, None, :]
            logits, cache = model.apply(
                params, jnp.asarray([[toks[t]]]),
                positions=jnp.asarray([[t]]), past_key_values=cache,
                cache_index=jnp.asarray([t]), attention_mask=mask,
                use_cache=True,
            )
            if t >= 6:
                nxt = int(jnp.argmax(logits[0, 0]))
                toks.append(nxt)
                want.append(nxt)
        assert got == want


def test_gqa_streaming_rope():
    model = LongContextLM(
        vocab_size=64, max_seq_len=16, n_layer=2, d_model=32, n_head=4,
        n_kv_head=2, positional="rope",
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    engine = InferenceEngine(model, params, n_slots=2, max_len=10_000,
                             window=8, sinks=2)
    engine.submit(Request([1, 2, 3], max_new_tokens=30, request_id=0))
    out = engine.run()[0]
    assert len(out.tokens) == 30
    assert engine.cache[0][0].shape[1:3] == (2, 10)  # kv heads x ring rows


def test_quantized_kernel_grouped_heads():
    """The int8 decode kernel with grouped queries must match dequantized
    repeated-head attention."""
    from multimodal_tpu.ops.kv_cache import quantize_kv, QuantizedKV
    from multimodal_tpu.ops.quantized_attention import (
        quantized_cache_attention,
        supports_quantized_attention,
    )

    b, hq, hkv, L, d = 2, 4, 2, 128, 16
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (b, hq, 1, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, L, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, hkv, L, d))
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    kc, vc = QuantizedKV(kq, ks), QuantizedKV(vq, vs)
    mask = (jnp.arange(L) < 70)[None, None, None, :]

    assert supports_quantized_attention(q, mask, 0.0, kv_heads=hkv)
    got = quantized_cache_attention(q, kc, vc, mask)

    kd = jnp.repeat(kc.dequantize(), hq // hkv, axis=1)
    vd = jnp.repeat(vc.dequantize(), hq // hkv, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, kd) / np.sqrt(d)
    s = jnp.where(mask, s, -1e30)
    want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), vd)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2
    )


def test_engine_gqa_int8_matches_fp32_greedy():
    model = LongContextLM(
        vocab_size=64, max_seq_len=128, n_layer=2, d_model=32, n_head=4,
        n_kv_head=2,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))

    def run(dtype):
        engine = InferenceEngine(model, params, n_slots=2, max_len=128,
                                 cache_dtype=dtype)
        engine.submit(Request([1, 2, 3, 4, 5], max_new_tokens=6,
                              request_id=0))
        return engine.run()[0].tokens

    assert run("int8") == run(jnp.float32)
