"""Speculative decoding: output must be token-identical to target-only
greedy decode, for any draft model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.examples.long_context.model import LongContextLM
from multimodal_tpu.serving.speculative import SpeculativeDecoder


def _lm(seed, n_layer=2, d_model=32, vocab=50, max_seq_len=64):
    model = LongContextLM(
        vocab_size=vocab, max_seq_len=max_seq_len, n_layer=n_layer,
        d_model=d_model, n_head=2, dim_feedforward=2 * d_model,
    )
    params = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 4), jnp.int32)
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


@pytest.mark.parametrize("gamma", [1, 3, 5])
def test_speculative_equals_target_greedy_independent_draft(gamma):
    """An unrelated draft (different init) mostly mismatches — output must
    still be exactly the target's greedy continuation."""
    target, t_params = _lm(seed=0, n_layer=2, d_model=32)
    draft, d_params = _lm(seed=99, n_layer=1, d_model=16)
    dec = SpeculativeDecoder(
        target, t_params, draft, d_params, max_len=64, gamma=gamma,
        cache_dtype=jnp.float32,
    )
    for prompt in ([1, 2, 3], [7], [4, 5, 6, 8, 9]):
        got = dec.generate(prompt, max_new_tokens=10)
        assert got == _ref_greedy(target, t_params, prompt, 10), prompt


def test_speculative_perfect_draft_takes_fewer_rounds():
    """When draft == target every proposal is accepted: gamma + 1 tokens per
    target forward."""
    target, t_params = _lm(seed=0)
    dec = SpeculativeDecoder(
        target, t_params, target, t_params, max_len=64, gamma=4,
        cache_dtype=jnp.float32,
    )
    got = dec.generate([1, 2, 3], max_new_tokens=10)
    assert got == _ref_greedy(target, t_params, [1, 2, 3], 10)
    assert dec.rounds == 2  # ceil(10 / (4 + 1)) target forwards, not 10


def test_speculative_eos_stops():
    target, t_params = _lm(seed=0)
    draft, d_params = _lm(seed=5, n_layer=1, d_model=16)
    first = _ref_greedy(target, t_params, [1, 2], 1)[0]
    dec = SpeculativeDecoder(
        target, t_params, draft, d_params, max_len=64, gamma=3,
        cache_dtype=jnp.float32,
    )
    got = dec.generate([1, 2], max_new_tokens=10, eos_id=first)
    assert got == [first]


def test_speculative_rejects_oversized():
    target, t_params = _lm(seed=0, max_seq_len=16)
    dec = SpeculativeDecoder(
        target, t_params, target, t_params, max_len=16, gamma=4,
    )
    with pytest.raises(ValueError):
        dec.generate([1] * 10, max_new_tokens=10)
