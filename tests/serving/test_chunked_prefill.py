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


def test_prefix_bucket_overflow_does_not_corrupt():
    """Regression (review finding): prefix_len + prompt bucket > max_len
    used to clamp the suffix block write backwards over the prefix rows.
    Per-position writes must keep the output identical to the full-prompt
    path."""
    model, params = _model_and_params(max_len=32)
    prefix = list(range(1, 18))    # 17 tokens
    prompt = list(range(20, 33))   # 13 tokens -> bucket 16; 17+16 > 32

    engine = InferenceEngine(model, params, n_slots=2, max_len=32)
    engine.register_prefix("sys", prefix)
    engine.submit(Request(prompt, max_new_tokens=2, request_id=0,
                          prefix="sys"))
    got = engine.run()[0].tokens

    full = InferenceEngine(model, params, n_slots=2, max_len=32)
    full.submit(Request(prefix + prompt, max_new_tokens=2, request_id=0))
    assert got == full.run()[0].tokens


def test_int8_dtype_object_rejected():
    """Regression (review finding): jnp.int8 used to silently truncate
    activations via the dense branch; it must be rejected loudly."""
    import pytest

    model, params = _model_and_params()
    with pytest.raises(ValueError, match="int8"):
        InferenceEngine(model, params, n_slots=2, max_len=64,
                        cache_dtype=jnp.int8)


def test_chunked_interleaves_with_decode():
    """A long prompt must not stall live slots: each step() advances the
    prefilling slot one chunk while decode of live slots proceeds."""
    model, params = _model_and_params(max_len=64)
    engine = InferenceEngine(
        model, params, n_slots=4, max_len=64, prefill_chunk=8,
        decode_steps=1,
    )
    # short request becomes live immediately
    engine.submit(Request([1, 2, 3], max_new_tokens=10, request_id="short"))
    engine.step()
    short_slot = next(s for s in engine._slots if not s.free)
    # long request: 4 chunks of 8
    engine.submit(Request(list(range(1, 33)), max_new_tokens=2,
                          request_id="long"))
    produced = []
    for _ in range(3):
        engine.step()
        long_slot = next(
            (s for s in engine._slots
             if s.request is not None and s.request.request_id == "long"),
            None,
        )
        produced.append(
            (len(short_slot.output.tokens),
             long_slot.prefilling if long_slot else False)
        )
    # the short request kept producing while the long one was mid-prefill
    counts = [c for c, _ in produced]
    assert counts[0] < counts[1] < counts[2]
    assert produced[0][1] and produced[1][1]  # long still prefilling
    outs = {o.request_id: o.tokens for o in engine.run()}
    # and the interleaved long output still matches the bucketed engine
    ref = InferenceEngine(model, params, n_slots=4, max_len=64)
    ref.submit(Request(list(range(1, 33)), max_new_tokens=2,
                       request_id="long"))
    assert outs["long"] == ref.run()[0].tokens
