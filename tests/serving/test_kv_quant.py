"""int8 KV cache: format round-trip, attention accuracy, engine parity."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.modules.layers.multi_head_attention import (
    MultiHeadAttentionWithCache,
)
from multimodal_tpu.ops.kv_cache import (
    QuantizedKV,
    quantize_kv,
    quantized_kv_zeros,
)
from multimodal_tpu.serving import InferenceEngine, Request


def test_quantize_kv_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 64))
    q, scale = quantize_kv(x)
    assert q.dtype == jnp.int8 and scale.shape == (2, 4, 16)
    rebuilt = np.asarray(q.astype(np.float32)) * np.asarray(scale)[..., None]
    err = np.abs(rebuilt - np.asarray(x)).max(axis=-1)
    assert (err <= np.asarray(scale) * 0.5 + 1e-6).all()


def test_mha_int8_cache_close_to_dense():
    mha = MultiHeadAttentionWithCache(dim_q=32, dim_kv=32, num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 32))
    params = mha.init(jax.random.PRNGKey(2), x, x, x)
    max_len = 6

    def decode(cache):
        outs = []
        for t in range(6):
            tok = x[:, t : t + 1]
            mask = (jnp.arange(max_len) <= t)[None, None, None, :]
            res = mha.apply(
                params, tok, tok, tok, attn_mask=mask, past_key_value=cache,
                use_cache=True, cache_index=jnp.asarray(t),
            )
            cache = res.past_key_value
            outs.append(res.attn_output)
        return jnp.concatenate(outs, axis=1), cache

    dense_out, _ = decode(
        (jnp.zeros((2, 4, max_len, 8)), jnp.zeros((2, 4, max_len, 8)))
    )
    q_out, q_cache = decode(
        (quantized_kv_zeros((2, 4, max_len, 8)),
         quantized_kv_zeros((2, 4, max_len, 8)))
    )
    assert isinstance(q_cache[0], QuantizedKV)  # cache stayed int8
    # per-row 127-level grid: attention outputs agree to ~1%
    np.testing.assert_allclose(
        np.asarray(q_out), np.asarray(dense_out), atol=0.02
    )


def test_engine_int8_cache_matches_fp32_greedy():
    from multimodal_tpu.examples.long_context.model import LongContextLM

    model = LongContextLM(
        vocab_size=50, max_seq_len=32, n_layer=2, d_model=32, n_head=2,
        dim_feedforward=64,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))

    def run(cache_dtype):
        engine = InferenceEngine(
            model, params, n_slots=2, max_len=32, cache_dtype=cache_dtype,
        )
        engine.register_prefix("sys", [9, 8])
        engine.submit(Request([1, 2, 3], max_new_tokens=6, request_id=0))
        engine.submit(
            Request([4, 5], max_new_tokens=6, request_id=1, prefix="sys")
        )
        return {o.request_id: o.tokens for o in engine.run()}

    # int8 rounding is far below this toy model's logit gaps: greedy paths
    # agree token-for-token, prefix caching included
    assert run("int8") == run(jnp.float32)
