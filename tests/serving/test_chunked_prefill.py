"""Chunked prefill: fixed-width chunk programs must reproduce the bucketed
prefill path token-for-token, including partial last chunks, prompts
ending near max_len, prefix caching, adapters, and the int8 cache."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.examples.long_context.model import LongContextLM
from multimodal_tpu.serving import InferenceEngine, Request


def _model_and_params(max_len=64):
    model = LongContextLM(
        vocab_size=64, max_seq_len=max_len, n_layer=2, d_model=32, n_head=2,
        dim_feedforward=64,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    return model, params


def _run(model, params, requests, **engine_kwargs):
    engine = InferenceEngine(model, params, **engine_kwargs)
    for r in requests:
        engine.submit(r)
    return {o.request_id: o.tokens for o in engine.run()}


def test_chunked_matches_bucketed_greedy():
    model, params = _model_and_params()
    rng = np.random.default_rng(0)
    # lengths straddle chunk boundaries: 1 over, exact multiple, 1 under
    reqs = lambda: [
        Request(rng.integers(1, 64, n).tolist(), max_new_tokens=5,
                request_id=i)
        for i, n in enumerate([17, 16, 15, 33, 9, 40])
    ]
    rng = np.random.default_rng(0)
    want = _run(model, params, reqs(), n_slots=8, max_len=64)
    rng = np.random.default_rng(0)
    got = _run(model, params, reqs(), n_slots=8, max_len=64,
               prefill_chunk=8)
    assert got == want


def test_chunked_partial_chunk_near_max_len_is_safe():
    """A partial last chunk whose block write would spill past max_len
    must not clamp back and corrupt earlier positions (the per-position
    sacrificial-index write)."""
    model, params = _model_and_params(max_len=32)
    prompt = list(range(1, 28))  # 27 tokens, chunk 8 -> last chunk 3 wide
    want = _run(
        model, params,
        [Request(prompt, max_new_tokens=4, request_id=0)],
        n_slots=2, max_len=32,
    )
    got = _run(
        model, params,
        [Request(prompt, max_new_tokens=4, request_id=0)],
        n_slots=2, max_len=32, prefill_chunk=8,
    )
    assert got == want


def test_chunked_with_prefix_and_int8():
    model, params = _model_and_params()

    def run(**kw):
        engine = InferenceEngine(model, params, n_slots=2, max_len=64, **kw)
        engine.register_prefix("sys", [9, 8, 7])
        engine.submit(Request(list(range(1, 20)), max_new_tokens=5,
                              request_id=0, prefix="sys"))
        return engine.run()[0].tokens

    want = run()
    assert run(prefill_chunk=8) == want
    assert run(prefill_chunk=8, cache_dtype="int8") == run(
        cache_dtype="int8"
    )


def test_chunked_with_adapters():
    from tests.serving.test_multi_lora import _random_adapter

    model, params = _model_and_params(max_len=32)
    adapters = {"a": _random_adapter(params, 1)}

    def run(**kw):
        return _run(
            model, params,
            [Request(list(range(1, 18)), max_new_tokens=5, request_id=0,
                     adapter="a")],
            n_slots=2, max_len=32, adapters=adapters, **kw,
        )

    assert run(prefill_chunk=8) == run()
