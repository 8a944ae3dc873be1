"""MUGEN (videoclip, text->video GPT, WordPiece) + CLIP-ResNet tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.examples.mugen.bert_text_transform import (
    BertTextTransform,
    WordPieceTokenizer,
)
from multimodal_tpu.examples.mugen.text_video_gpt import text_video_gpt
from multimodal_tpu.examples.mugen.video_clip import S3D, Projection, videoclip
from multimodal_tpu.models.clip.resnet_encoder import AttentionPool2d, ResNetForCLIP
from multimodal_tpu.utils.generate import GenerationUtil

from tests.test_utils import rng

VQVAE_SMALL = dict(
    encoder_hidden_dim=16, n_res_layers=1, attn_hidden_dim=16,
    num_embeddings=32, embedding_dim=8, decoder_hidden_dim=16,
)


def test_wordpiece():
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "play", "##ing", "the", "game", "."]
    tok = WordPieceTokenizer(vocab)
    assert tok.tokenize("playing the game.") == ["play", "##ing", "the", "game", "."]
    assert tok.tokenize("unknown") == ["[UNK]"]

    transform = BertTextTransform(vocab, max_length=8)
    out = transform(["playing the game.", "the game"])
    assert out.shape[0] == 2
    assert out[0, 0] == 2  # CLS
    assert 3 in out[0]     # SEP


@pytest.mark.slow
def test_s3d_and_projection():
    s3d = S3D()
    video = jnp.ones((1, 8, 32, 32, 3))
    variables = s3d.init(rng(0), video)
    feats = s3d.apply(variables, video)
    assert feats.shape == (1, 1024)

    proj = Projection(out_dim=16)
    p = proj.init(rng(1), feats)
    out = proj.apply(p, feats)
    assert out.shape == (1, 16)


@pytest.mark.slow
def test_videoclip_forward():
    model = videoclip(video_proj_out=16, text_proj_out=16, vocab_size=100)
    video = jnp.ones((2, 8, 32, 32, 3))
    text = jnp.ones((2, 6), jnp.int32)
    variables = model.init(rng(0), video, text)
    out = model.apply(variables, video, text)
    assert out.embeddings_a.shape == (2, 16)
    assert out.embeddings_b.shape == (2, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.embeddings_a), axis=-1), np.ones(2), rtol=1e-5
    )


@pytest.mark.slow
def test_text_video_gpt_generation():
    model = text_video_gpt(
        text_seq_len=8, video_seq_len=4, resolution=8,
        downsample=(2, 2, 2), d_model=24, n_head=2, dropout=0.0,
        attn_dropout=0.0, num_decoder_layers=2, text_vocab_size=60,
        vqvae_kwargs=VQVAE_SMALL,
    )
    video = jnp.asarray(np.random.RandomState(0).rand(1, 4, 8, 8, 3).astype(np.float32))
    text_tokens = jnp.asarray(np.random.RandomState(1).randint(0, 60, (1, 8)))
    out_tokens = jnp.asarray(np.random.RandomState(2).randint(0, 32, (1, 8)))
    variables = model.init(
        {"params": rng(0), "vq": rng(1)},
        video, video, text_tokens, out_tokens,
        method=type(model).init_weights,
    )
    # latent volume = 2*4*4 = 32 tokens
    gen = GenerationUtil(model, variables)
    out = gen.sample(text_tokens, max_seq_len=32, rng=rng(7), top_k=8)
    assert out.tokens.shape == (1, 32)
    assert out.decoded.shape == (1, 4, 8, 8, 3)


def test_clip_resnet_encoder():
    enc = ResNetForCLIP(layers=(1, 1, 1, 1), output_dim=16, heads=8, width=16,
                        input_resolution=64)
    x = jnp.ones((1, 64, 64, 3))
    variables = enc.init(rng(0), x)
    out = enc.apply(variables, x)
    assert out.shape == (1, 16)
    # bn3 zero-init: residual path initially contributes nothing
    bn3_scale = variables["params"]["layer1_0"]["bn3"]["scale"]
    assert float(jnp.abs(bn3_scale).sum()) == 0.0
