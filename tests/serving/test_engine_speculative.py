"""In-engine speculative decoding: a draft LM proposes gamma tokens per slot
per round, the target verifies the window in one forward, and the per-slot
rejection rule keeps every request's output distribution EXACTLY the
target's — greedy requests are token-identical to plain decoding, sampled
requests are distributionally lossless (Leviathan et al. rejection
sampling). Speculative and plain sampling requests share the continuous
batch. No reference counterpart (the reference has no serving at all).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.examples.long_context.model import LongContextLM
from multimodal_tpu.serving import InferenceEngine, Request
from multimodal_tpu.serving.speculative import speculative_acceptance

VOC = 50


def _models():
    target = LongContextLM(vocab_size=VOC, max_seq_len=64, n_layer=2,
                           d_model=32, n_head=2, dim_feedforward=64)
    t_params = target.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    draft = LongContextLM(vocab_size=VOC, max_seq_len=64, n_layer=1,
                          d_model=16, n_head=2, dim_feedforward=32)
    d_params = draft.init(jax.random.PRNGKey(7), jnp.zeros((1, 4), jnp.int32))
    return target, t_params, draft, d_params


PROMPTS = [[3, 1, 4], [1, 5, 9, 2], [6, 5], [35, 8, 9, 7, 9], [2, 7], [11]]


def _run(engine, temps, max_new=12, eos=None):
    reqs = [
        Request(prompt=p, max_new_tokens=max_new, request_id=str(i),
                temperature=temps[i], eos_id=eos)
        for i, p in enumerate(PROMPTS[: len(temps)])
    ]
    for r in reqs:
        engine.submit(r)
    outs = {o.request_id: o for o in engine.run()}
    return [outs[str(i)] for i in range(len(temps))]


def test_spec_engine_greedy_token_exact_with_slot_reuse():
    """6 greedy requests over 3 slots (forced slot recycling): the
    speculative engine's outputs equal the plain engine's token for
    token."""
    target, t_params, draft, d_params = _models()
    plain = InferenceEngine(target, t_params, n_slots=3, max_len=64,
                            decode_steps=2)
    spec = InferenceEngine(target, t_params, n_slots=3, max_len=64,
                           decode_steps=2, draft_model=draft,
                           draft_params=d_params, gamma=3)
    got_p = [o.tokens for o in _run(plain, [0.0] * 6)]
    got_s = [o.tokens for o in _run(spec, [0.0] * 6)]
    assert got_p == got_s
    st = spec.stats()
    assert st["spec_rounds"] > 0


def test_spec_engine_mixed_sampled_and_greedy_share_batch():
    """Sampled (temperature > 0) and greedy requests decode in the same
    speculative batch; the greedy rows stay token-exact vs the plain
    engine and the sampled rows complete at full length."""
    target, t_params, draft, d_params = _models()
    plain = InferenceEngine(target, t_params, n_slots=4, max_len=64,
                            decode_steps=2)
    spec = InferenceEngine(target, t_params, n_slots=4, max_len=64,
                           decode_steps=2, draft_model=draft,
                           draft_params=d_params, gamma=3)
    ref = [o.tokens for o in _run(plain, [0.0, 0.0, 0.0, 0.0])]
    mixed = _run(spec, [0.0, 1.0, 0.0, 0.8])
    assert mixed[0].tokens == ref[0]
    assert mixed[2].tokens == ref[2]
    assert len(mixed[1].tokens) == 12 and len(mixed[3].tokens) == 12


def test_spec_engine_eos_token_exact():
    target, t_params, draft, d_params = _models()
    plain = InferenceEngine(target, t_params, n_slots=2, max_len=64,
                            decode_steps=2)
    ref = _run(plain, [0.0], max_new=12)[0]
    eos = ref.tokens[5]
    plain2 = InferenceEngine(target, t_params, n_slots=2, max_len=64,
                             decode_steps=2)
    spec = InferenceEngine(target, t_params, n_slots=2, max_len=64,
                           decode_steps=2, draft_model=draft,
                           draft_params=d_params, gamma=3)
    o_p = _run(plain2, [0.0], eos=eos)[0]
    o_s = _run(spec, [0.0], eos=eos)[0]
    assert o_p.tokens == o_s.tokens
    assert o_s.finish_reason == "eos"


def test_spec_engine_draft_equals_target_accepts_every_proposal():
    """With draft == target the rejection ratio is identically 1, so every
    proposal must be accepted (acceptance == 1.0 exactly) — a sharp check
    that the draft's sampling distribution and the target's verify
    distribution go through IDENTICAL warping (temperature + filters); any
    asymmetry would show up as rejections."""
    target, t_params, _, _ = _models()
    spec = InferenceEngine(target, t_params, n_slots=2, max_len=64,
                           decode_steps=2, draft_model=target,
                           draft_params=t_params, gamma=3)
    reqs = [
        Request(prompt=[3, 1, 4], max_new_tokens=16, request_id="a",
                temperature=1.0, top_k=8),
        Request(prompt=[5, 9], max_new_tokens=16, request_id="b",
                temperature=0.7, top_p=0.9),
    ]
    for r in reqs:
        spec.submit(r)
    outs = {o.request_id: o for o in spec.run()}
    assert len(outs["a"].tokens) == 16 and len(outs["b"].tokens) == 16
    st = spec.stats()
    assert st["spec_acceptance"] == pytest.approx(1.0)


def test_speculative_acceptance_statistically_exact():
    """Monte Carlo check of the rejection rule (the lossless-sampling
    theorem): whatever the draft distribution, each emitted token is
    marginally distributed as the TARGET distribution — position 0
    unconditionally, position 1 conditional on position 0's acceptance."""
    V, g, N = 6, 3, 60000
    r = np.random.RandomState(0)
    qd = r.dirichlet(np.ones(V), size=g)
    qt = r.dirichlet(np.ones(V), size=g + 1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    proposed = jnp.stack(
        [
            jax.random.categorical(
                jax.random.fold_in(k1, i), jnp.log(jnp.asarray(qd[i])),
                shape=(N,),
            )
            for i in range(g)
        ],
        axis=1,
    ).astype(jnp.int32)
    dp = jnp.broadcast_to(jnp.asarray(qd, jnp.float32), (N, g, V))
    tp = jnp.broadcast_to(jnp.asarray(qt, jnp.float32), (N, g + 1, V))
    emit, k = jax.jit(speculative_acceptance)(proposed, dp, tp, k2)
    emit, k = np.asarray(emit), np.asarray(k)

    c0 = np.bincount(emit[:, 0], minlength=V) / N
    np.testing.assert_allclose(c0, qt[0], atol=0.02)
    m = k > 1
    c1 = np.bincount(emit[m, 1], minlength=V) / m.sum()
    np.testing.assert_allclose(c1, qt[1], atol=0.03)


def test_speculative_acceptance_greedy_one_hot_reduces_to_prefix_match():
    """One-hot target/draft distributions (the temperature == 0 encoding)
    reduce the rejection rule to longest-argmax-prefix-match + bonus."""
    V, g = 7, 3
    t_arg = np.array([2, 5, 1, 4])
    d_tok = np.array([[2, 5, 3]])  # matches at 0, 1; mismatch at 2
    tp = jnp.asarray(np.eye(V)[t_arg][None], jnp.float32)
    dp = jnp.asarray(np.eye(V)[d_tok[0]][None], jnp.float32)
    emit, k = speculative_acceptance(
        jnp.asarray(d_tok, jnp.int32), dp, tp, jax.random.PRNGKey(0)
    )
    assert int(k[0]) == 3
    assert np.asarray(emit)[0, :3].tolist() == [2, 5, 1]
    # full match -> bonus token from the target's last distribution
    d_tok2 = np.array([[2, 5, 1]])
    dp2 = jnp.asarray(np.eye(V)[d_tok2[0]][None], jnp.float32)
    emit2, k2 = speculative_acceptance(
        jnp.asarray(d_tok2, jnp.int32), dp2, tp, jax.random.PRNGKey(0)
    )
    assert int(k2[0]) == 4
    assert np.asarray(emit2)[0].tolist() == [2, 5, 1, 4]


def test_spec_engine_validation():
    target, t_params, draft, d_params = _models()
    with pytest.raises(ValueError, match="speculative"):
        InferenceEngine(target, t_params, n_slots=2, max_len=64,
                        draft_model=draft, draft_params=d_params,
                        cache_dtype="int8")
    spec = InferenceEngine(target, t_params, n_slots=2, max_len=64,
                           draft_model=draft, draft_params=d_params,
                           gamma=3)
    with pytest.raises(ValueError, match="slack"):
        spec.submit(Request(prompt=[1] * 30, max_new_tokens=31,
                            request_id="too-long"))
