"""Per-request conditioning through the serving engine.

A cross-attention LM (decoder layers attending a per-request encoder
state) served through ``InferenceEngine(conditioning_spec=...)`` must
produce, for every request, exactly the tokens of a standalone greedy
loop running full forwards with THAT request's conditioning — across
admissions, slot reuse, and lockstep decode of requests conditioned on
different states.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from multimodal_tpu.modules.layers.transformer import TransformerDecoder
from multimodal_tpu.serving import InferenceEngine, Request


class CondLM(nn.Module):
    """Tiny decoder-only LM whose layers cross-attend ``conditioning``
    (b, n_ctx, cond_dim) — the engine's conditioned-LM decode surface."""

    vocab_size: int = 50
    max_seq_len: int = 32
    n_layer: int = 2
    d_model: int = 32
    n_head: int = 2
    dim_feedforward: int = 64
    cond_dim: int = 16

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        positions: Optional[jnp.ndarray] = None,
        past_key_values=None,
        cache_index: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        use_cache: bool = False,
        conditioning: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        b, s = tokens.shape
        pos = jnp.arange(s)[None, :] if positions is None else positions
        x = nn.Embed(self.vocab_size, self.d_model, name="tok")(tokens)
        x = x + nn.Embed(self.max_seq_len, self.d_model, name="pos")(pos)
        out = TransformerDecoder(
            n_layer=self.n_layer,
            d_model=self.d_model,
            n_head=self.n_head,
            dim_feedforward=self.dim_feedforward,
            activation="gelu",
            layer_norm_eps=1e-5,
            norm_first=True,
            use_cross_attention=True,
            dim_kv=self.cond_dim,
            final_layer_norm_eps=1e-5,
            name="decoder",
        )(
            x,
            encoder_hidden_states=conditioning,
            attention_mask=attention_mask,
            past_key_values=past_key_values,
            use_cache=use_cache,
            is_causal=attention_mask is None,
            deterministic=deterministic,
            cache_index=cache_index,
        )
        logits = nn.Dense(self.vocab_size, use_bias=False, name="head")(
            out.last_hidden_state
        )
        if use_cache:
            return logits, out.current_key_values
        return logits


N_CTX = 5
COND_DIM = 16


def _setup():
    model = CondLM(cond_dim=COND_DIM)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4), jnp.int32),
        conditioning=jnp.zeros((1, N_CTX, COND_DIM)),
    )
    return model, params


def _cond(i: int) -> np.ndarray:
    return np.asarray(
        jax.random.normal(jax.random.PRNGKey(100 + i), (N_CTX, COND_DIM))
    )


def _ref_greedy(model, params, prompt, cond, max_new):
    toks = list(prompt)
    out = []
    for _ in range(max_new):
        logits = model.apply(
            params,
            jnp.asarray([toks], jnp.int32),
            conditioning=jnp.asarray(cond)[None],
        )
        nxt = int(jnp.argmax(logits[0, -1]))
        out.append(nxt)
        toks.append(nxt)
    return out


def _spec():
    return jax.ShapeDtypeStruct((N_CTX, COND_DIM), jnp.float32)


@pytest.mark.parametrize("decode_steps", [1, 3])
def test_conditioned_greedy_matches_full_forward(decode_steps):
    """Mixed-conditioning batch: every slot decodes against ITS image."""
    model, params = _setup()
    engine = InferenceEngine(
        model, params, n_slots=3, max_len=32, cache_dtype=jnp.float32,
        decode_steps=decode_steps, conditioning_spec=_spec(),
    )
    prompts = [[1, 2, 3], [4, 5], [6, 7, 8, 9], [10]]
    for i, p in enumerate(prompts):
        engine.submit(
            Request(p, max_new_tokens=6, request_id=i, conditioning=_cond(i))
        )
    outs = {o.request_id: o for o in engine.run()}
    assert len(outs) == 4
    for i, p in enumerate(prompts):
        expected = _ref_greedy(model, params, p, _cond(i), 6)
        assert outs[i].tokens == expected, f"request {i}"


def test_slot_reuse_overwrites_conditioning():
    """A reused slot must serve the NEW request's conditioning — stale
    rows would silently caption the previous image."""
    model, params = _setup()
    engine = InferenceEngine(
        model, params, n_slots=2, max_len=32, cache_dtype=jnp.float32,
        conditioning_spec=_spec(),
    )
    prompts = [[i + 1, i + 2] for i in range(6)]
    for i, p in enumerate(prompts):
        engine.submit(
            Request(p, max_new_tokens=4, request_id=i, conditioning=_cond(i))
        )
    outs = {o.request_id: o for o in engine.run()}
    assert len(outs) == 6
    for i, p in enumerate(prompts):
        assert outs[i].tokens == _ref_greedy(model, params, p, _cond(i), 4)


def test_conditioned_chunked_prefill():
    model, params = _setup()
    engine = InferenceEngine(
        model, params, n_slots=2, max_len=32, cache_dtype=jnp.float32,
        prefill_chunk=4, conditioning_spec=_spec(),
    )
    prompts = [list(range(1, 11)), list(range(3, 10))]  # > chunk width
    for i, p in enumerate(prompts):
        engine.submit(
            Request(p, max_new_tokens=5, request_id=i, conditioning=_cond(i))
        )
    outs = {o.request_id: o for o in engine.run()}
    for i, p in enumerate(prompts):
        assert outs[i].tokens == _ref_greedy(model, params, p, _cond(i), 5)


def test_conditioning_required_iff_spec():
    model, params = _setup()
    engine = InferenceEngine(
        model, params, n_slots=1, max_len=32, cache_dtype=jnp.float32,
        conditioning_spec=_spec(),
    )
    with pytest.raises(ValueError, match="conditioning"):
        engine.submit(Request([1, 2], max_new_tokens=2))  # missing

    plain_model, plain_params = _setup()
    plain = InferenceEngine(
        plain_model, plain_params, n_slots=1, max_len=32,
        cache_dtype=jnp.float32,
    )
    with pytest.raises(ValueError, match="conditioning"):
        plain.submit(
            Request([1, 2], max_new_tokens=2, conditioning=_cond(0))
        )


def test_conditioning_shape_mismatch_rejected():
    model, params = _setup()
    engine = InferenceEngine(
        model, params, n_slots=1, max_len=32, cache_dtype=jnp.float32,
        conditioning_spec=_spec(),
    )
    with pytest.raises(ValueError, match="leaf shape"):
        engine.submit(
            Request(
                [1, 2], max_new_tokens=2,
                conditioning=np.zeros((N_CTX + 1, COND_DIM), np.float32),
            )
        )


def test_prefix_caching_rejected_with_conditioning():
    model, params = _setup()
    engine = InferenceEngine(
        model, params, n_slots=1, max_len=32, cache_dtype=jnp.float32,
        conditioning_spec=_spec(),
    )
    with pytest.raises(ValueError, match="prefix caching"):
        engine.register_prefix("sys", [1, 2, 3])
