"""Sliding-window + attention-sink streaming (StreamingLLM-style).

The engine's ring-buffer window mode must (a) reduce exactly to full
attention while nothing has wrapped, and (b) after wrapping, match a
hand-rolled reference that keeps the FULL cache but masks attention to
sinks + last-window — proving the ring write/mask bookkeeping drops
precisely the right keys. Requires rope positions (unbounded ids)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.examples.long_context.model import LongContextLM
from multimodal_tpu.serving import InferenceEngine, Request


@pytest.fixture(scope="module")
def rope_lm():
    model = LongContextLM(
        vocab_size=64, max_seq_len=32, n_layer=2, d_model=32, n_head=2,
        dim_feedforward=64, positional="rope",
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    return model, params


def test_rope_cached_decode_matches_full(rope_lm):
    model, params = rope_lm
    tokens = jnp.asarray([[5, 9, 2, 7, 1, 3]])
    full_logits = model.apply(params, tokens)

    max_len = 8
    cache = tuple(
        (jnp.zeros((1, 2, max_len, 16)), jnp.zeros((1, 2, max_len, 16)))
        for _ in range(2)
    )
    outs = []
    for t in range(6):
        mask = (jnp.arange(max_len) <= t)[None, None, None, :]
        logits, cache = model.apply(
            params, tokens[:, t : t + 1],
            positions=jnp.asarray([[t]]), past_key_values=cache,
            cache_index=jnp.asarray([t]), attention_mask=mask,
            use_cache=True,
        )
        outs.append(logits)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs, axis=1)),
        np.asarray(full_logits), atol=1e-4,
    )


def test_window_no_wrap_equals_full(rope_lm):
    model, params = rope_lm
    prompt = [1, 2, 3, 4]

    full = InferenceEngine(model, params, n_slots=2, max_len=24)
    full.submit(Request(prompt, max_new_tokens=6, request_id=0))
    want = full.run()[0].tokens

    # sinks + window covers the whole generation: identical attention
    win = InferenceEngine(model, params, n_slots=2, max_len=24,
                          window=20, sinks=4)
    win.submit(Request(prompt, max_new_tokens=6, request_id=0))
    assert win.run()[0].tokens == want


def _windowed_reference(model, params, prompt, n_new, sinks, window):
    """Greedy decode with a FULL-length cache but attention masked to
    sinks + last ``window`` positions — the semantics the ring must
    reproduce."""
    total = len(prompt) + n_new + 1
    cache = tuple(
        (jnp.zeros((1, 2, total, 16)), jnp.zeros((1, 2, total, 16)))
        for _ in range(2)
    )
    toks = list(prompt)
    out_tokens = []
    logits = None
    for p in range(len(prompt) + n_new - 1):
        tok = toks[p]
        rows = jnp.arange(total)
        valid = (rows <= p) & ((rows < sinks) | (rows > p - window))
        logits, cache = model.apply(
            params, jnp.asarray([[tok]]), positions=jnp.asarray([[p]]),
            past_key_values=cache, cache_index=jnp.asarray([p]),
            attention_mask=valid[None, None, None, :], use_cache=True,
        )
        if p >= len(prompt) - 1:
            nxt = int(jnp.argmax(logits[0, 0]))
            toks.append(nxt)
            out_tokens.append(nxt)
    return out_tokens


def test_window_wraparound_matches_masked_reference(rope_lm):
    model, params = rope_lm
    prompt = [7, 3, 9, 5]
    sinks, window, n_new = 2, 6, 10  # generation wraps the ring twice

    want = _windowed_reference(model, params, prompt, n_new, sinks, window)

    engine = InferenceEngine(model, params, n_slots=2, max_len=9999,
                             window=window, sinks=sinks)
    engine.submit(Request(prompt, max_new_tokens=n_new, request_id=0))
    assert engine.run()[0].tokens == want


def test_streaming_far_past_buffer(rope_lm):
    """Generation 5x the buffer length: constant memory, finite outputs,
    positions keep growing."""
    model, params = rope_lm
    engine = InferenceEngine(model, params, n_slots=2, max_len=10_000,
                             window=8, sinks=2)
    engine.submit(Request([1, 2, 3], max_new_tokens=50, request_id=0))
    out = engine.run()[0]
    assert len(out.tokens) == 50
    assert all(0 <= t < 64 for t in out.tokens)
    assert engine.cache[0][0].shape[2] == 10  # sinks + window rows only

    # prompts that would wrap are rejected up front
    with pytest.raises(ValueError, match="streaming buffer"):
        engine.submit(Request(list(range(12)), max_new_tokens=4))
