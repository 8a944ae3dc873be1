"""HTTP serving front-end: blocking + SSE generate, stats, error paths."""

import json
import urllib.request

import jax
import jax.numpy as jnp
import pytest

from multimodal_tpu.examples.long_context.model import LongContextLM
from multimodal_tpu.serving import InferenceEngine
from multimodal_tpu.serving.http_server import ServingFrontend


@pytest.fixture(scope="module")
def frontend():
    model = LongContextLM(
        vocab_size=50, max_seq_len=32, n_layer=2, d_model=32, n_head=2,
        dim_feedforward=64,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    engine = InferenceEngine(model, params, n_slots=2, max_len=32)
    fe = ServingFrontend(engine)
    yield fe
    fe.close()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=120)


def test_generate_blocking(frontend):
    with _post(frontend.url + "/generate",
               {"prompt": [1, 2, 3], "max_new_tokens": 5}) as r:
        out = json.loads(r.read())
    assert len(out["tokens"]) == 5
    assert out["finish_reason"] == "length"
    assert out["prefill_time"] > 0 and out["decode_time"] > 0

    # greedy determinism across the wire
    with _post(frontend.url + "/generate",
               {"prompt": [1, 2, 3], "max_new_tokens": 5}) as r:
        assert json.loads(r.read())["tokens"] == out["tokens"]


def test_generate_streaming(frontend):
    with _post(frontend.url + "/generate",
               {"prompt": [4, 5], "max_new_tokens": 4, "stream": True}) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        events = []
        for raw in r:
            raw = raw.strip()
            if raw.startswith(b"data: "):
                events.append(json.loads(raw[len(b"data: "):]))
    tokens = [e["token"] for e in events if "token" in e]
    assert len(tokens) == 4
    assert events[-1]["done"] and events[-1]["n_tokens"] == 4

    # streamed tokens == blocking tokens
    with _post(frontend.url + "/generate",
               {"prompt": [4, 5], "max_new_tokens": 4}) as r:
        assert json.loads(r.read())["tokens"] == tokens


def test_stats_and_health(frontend):
    with urllib.request.urlopen(frontend.url + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["ok"]
    with urllib.request.urlopen(frontend.url + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["requests_finished"] >= 1
    assert stats["tokens_out"] >= 5


def test_bad_requests(frontend):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(frontend.url + "/generate", {"max_new_tokens": 2})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(frontend.url + "/generate",
              {"prompt": [1], "adapter": "nope"})
    assert e.value.code == 400


def test_cancellation_frees_slot():
    """A cancelled request retires with finish_reason='cancelled' whether
    queued or mid-decode."""
    from multimodal_tpu.serving import Request as Req

    model = LongContextLM(
        vocab_size=50, max_seq_len=64, n_layer=2, d_model=32, n_head=2,
        dim_feedforward=64,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    from multimodal_tpu.serving import InferenceEngine as Eng

    engine = Eng(model, params, n_slots=1, max_len=64, decode_steps=2)
    live = Req([1, 2, 3], max_new_tokens=40, request_id="live")
    queued = Req([4, 5], max_new_tokens=4, request_id="queued")
    engine.submit(live)
    engine.submit(queued)
    engine.step()          # live admitted + decodes a little
    engine.cancel(live)    # client went away
    outs = {o.request_id: o for o in engine.run()}
    assert outs["live"].finish_reason == "cancelled"
    assert len(outs["live"].tokens) < 40
    # the queued request got the freed slot and ran normally
    assert outs["queued"].finish_reason == "length"
    assert len(outs["queued"].tokens) == 4


def test_dispatcher_death_fails_requests_loudly():
    """If the engine thread dies, waiting requests get an error instead of
    hanging forever, and new submissions fail fast."""
    import queue as queue_mod

    from multimodal_tpu.serving.http_server import EngineDispatcher

    class ExplodingEngine:
        _queue = [1]  # looks busy so the loop calls step()
        _slots = []

        def step(self):
            raise RuntimeError("device fell over")

        def submit(self, request):
            pass

        def cancel(self, request):
            pass

        def stats(self):
            return {}

    d = EngineDispatcher(ExplodingEngine())
    from multimodal_tpu.serving import Request as Req

    events = d.submit_request(Req([1], max_new_tokens=2))
    kind, payload = events.get(timeout=30)
    assert kind == "error" and "device fell over" in payload
    # subsequent submissions fail immediately
    events2 = d.submit_request(Req([1], max_new_tokens=2))
    kind2, payload2 = events2.get(timeout=5)
    assert kind2 == "error" and "unavailable" in payload2
    d.shutdown()
