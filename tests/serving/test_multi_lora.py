"""Multi-LoRA serving: batched per-slot adapters == folded single-adapter
engines, token for token."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.examples.long_context.model import LongContextLM
from multimodal_tpu.serving import InferenceEngine, Request
from multimodal_tpu.serving.multi_lora import stack_adapters
from multimodal_tpu.training.lora import LoRAFactor, lora_fold, lora_init


def _model_and_params():
    model = LongContextLM(
        vocab_size=64, max_seq_len=32, n_layer=2, d_model=32, n_head=2,
        dim_feedforward=64,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    return model, params


def _random_adapter(params, seed):
    """lora_init gives b=0 (adapter == base); fill b with noise so each
    adapter actually changes the model."""
    lora = lora_init(
        jax.random.PRNGKey(seed), params, rank=4, min_size=1,
        targets=("q_proj", "v_proj", "out"),
    )
    keys = iter(jax.random.split(jax.random.PRNGKey(100 + seed), 64))

    def fill(leaf):
        if isinstance(leaf, LoRAFactor):
            return LoRAFactor(
                a=leaf.a,
                b=0.3 * jax.random.normal(next(keys), leaf.b.shape),
                alpha=leaf.alpha,
            )
        return leaf

    return jax.tree_util.tree_map(
        fill, lora, is_leaf=lambda x: isinstance(x, LoRAFactor)
    )


def test_stack_adapters_validates_structure():
    _model, params = _model_and_params()
    a = _random_adapter(params, 1)
    mismatched = lora_init(
        jax.random.PRNGKey(9), params, rank=4, min_size=1, targets=("q_proj",)
    )
    with pytest.raises(ValueError):
        stack_adapters([a, mismatched])


def test_engine_mixed_adapters_match_folded_engines():
    model, params = _model_and_params()
    adapters = {
        "a": _random_adapter(params, 1),
        "b": _random_adapter(params, 2),
    }
    prompts = {None: [1, 2, 3], "a": [4, 5, 6, 7], "b": [8, 9]}

    # one multi-adapter engine serving all three in the same batch
    multi = InferenceEngine(
        model, params, n_slots=4, max_len=32, adapters=adapters,
    )
    for name, prompt in prompts.items():
        multi.submit(
            Request(prompt, max_new_tokens=6, request_id=name, adapter=name)
        )
    got = {o.request_id: o.tokens for o in multi.run()}

    # reference: one folded engine per adapter, run alone
    for name, prompt in prompts.items():
        folded = (
            params if name is None else lora_fold(params, adapters[name])
        )
        solo = InferenceEngine(model, folded, n_slots=2, max_len=32)
        solo.submit(Request(prompt, max_new_tokens=6, request_id=name))
        want = solo.run()[0].tokens
        assert got[name] == want, f"adapter {name!r} diverged"

    # adapters must actually differ from the base (b != 0 did something)
    assert got["a"] != got[None] or got["b"] != got[None]


def test_engine_adapter_with_prefix_caching():
    model, params = _model_and_params()
    adapters = {"a": _random_adapter(params, 3)}
    engine = InferenceEngine(
        model, params, n_slots=2, max_len=32, adapters=adapters,
    )
    engine.register_prefix("sys", [9, 8, 7], adapter="a")
    engine.submit(
        Request([1, 2], max_new_tokens=5, request_id=0, prefix="sys",
                adapter="a")
    )
    got = engine.run()[0].tokens

    folded = lora_fold(params, adapters["a"])
    solo = InferenceEngine(model, folded, n_slots=2, max_len=32)
    solo.submit(Request([9, 8, 7, 1, 2], max_new_tokens=5, request_id=0))
    assert got == solo.run()[0].tokens

    # mismatched pairing is rejected (prefix KV is adapter-dependent)
    with pytest.raises(ValueError):
        engine.submit(Request([1], max_new_tokens=2, prefix="sys"))


def test_unknown_adapter_rejected():
    model, params = _model_and_params()
    engine = InferenceEngine(model, params, n_slots=2, max_len=32)
    with pytest.raises(ValueError):
        engine.submit(Request([1, 2], max_new_tokens=2, adapter="nope"))


def test_unconsumed_adapter_raises():
    """Regression (review finding): an adapted kernel the interceptor
    cannot reach must raise, not silently serve base weights."""
    from multimodal_tpu.serving.multi_lora import (
        build_adapter_table,
        multi_lora_scope,
    )

    model, params = _model_and_params()
    _table, stacked = build_adapter_table({"a": _random_adapter(params, 1)})
    x = jnp.zeros((3, 4), jnp.int32)
    with pytest.raises(ValueError, match="never applied"):
        # adapter_ids batch (2) mismatches the model batch (3): every
        # factor is skipped and the scope must notice on exit
        with multi_lora_scope(stacked, jnp.zeros((2,), jnp.int32)):
            model.apply(params, x)
