"""Per-request sampling params: the vectorized per-row filters must match
the sequential global filters, and the engine must honor per-slot
top-k/top-p."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.examples.long_context.model import LongContextLM
from multimodal_tpu.serving import InferenceEngine, Request
from multimodal_tpu.utils.generate import (
    filter_logits_per_row,
    logits_filter_top_k,
    logits_filter_top_p,
)


def test_per_row_filters_match_global():
    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 50))
    for k, p in [(5, 1.0), (0, 0.7), (8, 0.5), (0, 1.0)]:
        want = logits
        if k:
            want = logits_filter_top_k(want, k)
        if p < 1.0:
            want = logits_filter_top_p(want, p)
        got = filter_logits_per_row(
            logits, jnp.full((4,), k, jnp.int32), jnp.full((4,), p)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6,
            err_msg=f"k={k} p={p}",
        )


def test_per_row_filters_are_independent():
    logits = jax.random.normal(jax.random.PRNGKey(1), (3, 40))
    got = filter_logits_per_row(
        logits, jnp.asarray([1, 0, 10]), jnp.asarray([1.0, 0.3, 1.0])
    )
    # row 0: only the max survives
    assert int(jnp.sum(jnp.isfinite(got[0]))) == 1
    # row 1: nucleus keeps a prefix of the sorted distribution
    n1 = int(jnp.sum(jnp.isfinite(got[1])))
    assert 1 <= n1 < 40
    # row 2: exactly 10 survive
    assert int(jnp.sum(jnp.isfinite(got[2]))) == 10


def _engine():
    model = LongContextLM(
        vocab_size=64, max_seq_len=32, n_layer=2, d_model=32, n_head=2,
        dim_feedforward=64,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    return model, params


def test_engine_top_k_one_is_deterministic():
    """temperature > 0 with top_k=1 must equal greedy — exercising the
    per-slot filter through the whole engine path."""
    model, params = _engine()
    engine = InferenceEngine(model, params, n_slots=4, max_len=32)
    engine.submit(Request([1, 2, 3], max_new_tokens=6, request_id="greedy"))
    engine.submit(Request([1, 2, 3], max_new_tokens=6, request_id="k1",
                          temperature=1.7, top_k=1))
    engine.submit(Request([1, 2, 3], max_new_tokens=6, request_id="p0",
                          temperature=0.9, top_p=1e-9))
    outs = {o.request_id: o.tokens for o in engine.run()}
    assert outs["k1"] == outs["greedy"]
    assert outs["p0"] == outs["greedy"]


def test_engine_mixed_sampling_params_run():
    model, params = _engine()
    engine = InferenceEngine(model, params, n_slots=4, max_len=32, top_k=50)
    for i, (t, k, p) in enumerate(
        [(0.0, None, None), (1.0, 5, None), (0.8, None, 0.9), (1.2, 3, 0.5)]
    ):
        engine.submit(Request([1, 2, 3], max_new_tokens=5, request_id=i,
                              temperature=t, top_k=k, top_p=p))
    outs = engine.run()
    assert len(outs) == 4
    assert all(len(o.tokens) == 5 for o in outs)
