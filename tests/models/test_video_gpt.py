"""VQVAE / VideoGPT / generation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.models.video_gpt.model import video_gpt, video_vqvae
from multimodal_tpu.utils.generate import (
    GenerationUtil,
    get_logits_mask,
    logits_filter_top_k,
    logits_filter_top_p,
)

from tests.test_utils import assert_expected, rng

VQVAE_SMALL = dict(
    encoder_hidden_dim=16, n_res_layers=1, attn_hidden_dim=16,
    num_embeddings=32, embedding_dim=8, decoder_hidden_dim=16,
)


@pytest.fixture(scope="module")
def small_vqvae_and_video():
    model = video_vqvae(**VQVAE_SMALL)
    video = jnp.asarray(np.random.RandomState(0).rand(2, 4, 8, 8, 3).astype(np.float32))
    variables = model.init({"params": rng(0), "vq": rng(1)}, video, deterministic=False)
    return model, variables, video


def test_video_vqvae_roundtrip(small_vqvae_and_video):
    model, variables, video = small_vqvae_and_video
    out, new_vars = model.apply(
        variables, video, deterministic=False,
        rngs={"vq": rng(2)}, mutable=["vq_stats", "batch_stats"],
    )
    assert out.decoded.shape == video.shape
    assert out.codebook_output.codebook_indices.shape == (2, 2, 4, 4)

    # encode -> decode roundtrip (eval mode)
    merged = {**variables, **new_vars}
    indices = model.apply(merged, video, method=type(model).encode)
    assert indices.shape == (2, 2, 4, 4)
    decoded = model.apply(merged, indices, method=type(model).decode)
    assert decoded.shape == video.shape
    assert model.encoder.get_latent_shape((4, 8, 8)) == (2, 4, 4)


def test_logits_filters():
    logits = jnp.asarray([[1.0, 3.0, 2.0, 0.5]])
    topk = logits_filter_top_k(logits, 2)
    assert_expected(topk, np.array([[-np.inf, 3.0, 2.0, -np.inf]]))
    topp = logits_filter_top_p(logits, 0.5)
    assert bool(jnp.isfinite(topp[0, 1]))
    assert not bool(jnp.isfinite(topp[0, 3]))
    mask = get_logits_mask(2, 3, 4, 5)
    assert mask.shape == (5, 9)
    assert_expected(mask[:2, :4], np.ones((2, 4)))
    assert_expected(mask[2:, 4:], np.ones((3, 5)))
    assert_expected(mask[:2, 4:], np.zeros((2, 5)))


@pytest.fixture(scope="module")
def small_video_gpt():
    model = video_gpt(
        input_shape=(4, 8, 8), latent_shape=(2, 4, 4), d_model=24, n_head=2,
        dropout=0.0, attn_dropout=0.0, num_decoder_layers=2,
        vqvae_kwargs=VQVAE_SMALL,
    )
    video = jnp.asarray(np.random.RandomState(0).rand(1, 4, 8, 8, 3).astype(np.float32))
    in_tokens = jnp.asarray(np.random.RandomState(1).randint(0, 32, (1, 8)))
    out_tokens = jnp.asarray(np.random.RandomState(2).randint(0, 32, (1, 8)))
    variables = model.init(
        {"params": rng(0), "vq": rng(1)},
        video, video, in_tokens, out_tokens,
        method=type(model).init_weights,
    )
    return model, variables, video


def test_multimodal_gpt_forward(small_video_gpt):
    model, variables, video = small_video_gpt
    in_tokens = jnp.ones((2, 5), jnp.int32)
    out_tokens = jnp.ones((2, 7), jnp.int32)
    out = model.apply(
        variables, in_tokens=in_tokens, out_tokens=out_tokens, causal=True,
        right_shift=True,
    )
    assert out.logits.shape == (2, 12, 64)  # 32+32 token states
    assert out.decoder_output.last_hidden_states.shape == (2, 12, 24)


def test_gpt_cached_decode_matches_full(small_video_gpt):
    """Fixed-cache single-token decoding == full causal forward."""
    model, variables, _ = small_video_gpt
    in_tokens = jnp.asarray([[3, 7, 1, 4]])

    full = model.apply(
        variables, in_tokens=in_tokens, causal=True, right_shift=True,
        method=type(model).fwd,
    )

    # prime with first 4 tokens, then verify cache contents match
    primed = model.apply(
        variables, in_tokens=in_tokens, causal=True, right_shift=True,
        use_cache=True, method=type(model).fwd,
    )
    assert primed.past_key_values[0][0].shape[2] == 4
    assert_expected(
        primed.last_hidden_states, full.last_hidden_states, rtol=1e-4, atol=1e-4
    )


def test_generation_end_to_end(small_video_gpt):
    model, variables, video = small_video_gpt
    gen = GenerationUtil(model, variables)
    out = gen.sample(video, max_seq_len=32, rng=rng(42), top_k=8, top_p=0.9)
    assert out.tokens.shape == (1, 32)
    assert out.decoded.shape == (1, 4, 8, 8, 3)
    tokens = np.asarray(out.tokens)
    assert tokens.min() >= 0 and tokens.max() < 32
