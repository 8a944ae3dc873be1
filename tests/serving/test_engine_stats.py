"""Engine observability: per-request latency breakdown + engine stats."""

import jax
import jax.numpy as jnp

from multimodal_tpu.examples.long_context.model import LongContextLM
from multimodal_tpu.serving import InferenceEngine, Request


def test_latency_breakdown_and_stats():
    model = LongContextLM(
        vocab_size=50, max_seq_len=32, n_layer=2, d_model=32, n_head=2,
        dim_feedforward=64,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    engine = InferenceEngine(model, params, n_slots=2, max_len=32)
    for i in range(3):  # 3 requests > 2 slots: one queues
        engine.submit(Request([1, 2, 3], max_new_tokens=5, request_id=i))
    outs = engine.run()

    assert len(outs) == 3
    for o in outs:
        assert o.queue_time >= 0.0
        assert o.prefill_time > 0.0
        assert o.decode_time > 0.0
        assert o.decode_tokens_per_sec > 0.0
    # the third request waited for a slot
    assert max(o.queue_time for o in outs) > 0.0

    s = engine.stats()
    assert s["requests_finished"] == 3
    assert s["tokens_out"] == 15
    assert s["queue_depth"] == 0 and s["live_slots"] == 0
    assert 0.0 < s["occupancy"] <= 1.0
    assert s["ticks"] > 0
