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
