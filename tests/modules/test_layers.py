import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.modules.layers.activation import GEGLU, quick_gelu
from multimodal_tpu.modules.layers.attention import (
    AxialAttention,
    MultiHeadAttention,
    SelfAttention,
)
from multimodal_tpu.modules.layers.attention_pooler import AttentionPooler
from multimodal_tpu.modules.layers.codebook import Codebook
from multimodal_tpu.modules.layers.conv import SamePadConv3d, SamePadConvTranspose3d
from multimodal_tpu.modules.layers.mlp import MLP
from multimodal_tpu.modules.layers.multi_head_attention import (
    MultiHeadAttentionWithCache,
    MultiHeadSelfAttention,
)
from multimodal_tpu.modules.layers.normalizations import (
    Fp32LayerNorm,
    RMSNorm,
    SimpleRMSNorm,
)
from multimodal_tpu.modules.layers.patch_embedding import PatchEmbeddings
from multimodal_tpu.modules.layers.position_embedding import (
    BroadcastedPositionEmbedding,
    SinusoidalPositionEmbeddings,
)
from multimodal_tpu.modules.layers.text_embedding import BERTTextEmbeddings
from multimodal_tpu.modules.layers.transformer import (
    TransformerDecoder,
    TransformerEncoder,
)
from multimodal_tpu.modules.masking.random_masking import random_masking

from tests.test_utils import assert_expected, rng


def test_quick_gelu():
    x = jnp.array([-1.0, 0.0, 1.0, 2.0])
    expected = np.asarray(x) * (1 / (1 + np.exp(-1.702 * np.asarray(x))))
    assert_expected(quick_gelu(x), expected)


def test_fp32_layernorm_bf16():
    x = jnp.ones((2, 8), jnp.bfloat16) * 3
    ln = Fp32LayerNorm()
    params = ln.init(rng(), x)
    y = ln.apply(params, x)
    assert y.dtype == jnp.bfloat16
    assert_expected(y.astype(jnp.float32), np.zeros((2, 8)), atol=1e-2)


def test_rmsnorms():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16).astype(np.float32))
    m = RMSNorm()
    y = m.apply(m.init(rng(), x), x)
    expected = np.asarray(x) / np.sqrt((np.asarray(x) ** 2).mean(-1, keepdims=True) + 1e-6)
    assert_expected(y, expected, atol=1e-5)

    s = SimpleRMSNorm()
    y2 = s.apply({}, x)
    xn = np.asarray(x)
    expected2 = xn / np.linalg.norm(xn, axis=-1, keepdims=True) * np.sqrt(16)
    assert_expected(y2, expected2, atol=1e-5)


def test_mlp_shapes():
    m = MLP(in_dim=8, out_dim=4, hidden_dims=[16, 16], dropout=0.0)
    x = jnp.ones((2, 8))
    y = m.apply(m.init(rng(), x), x)
    assert y.shape == (2, 4)


def test_mhsa_shapes_and_mask():
    m = MultiHeadSelfAttention(embed_dim=32, num_heads=4)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 7, 32).astype(np.float32))
    params = m.init(rng(), x)
    y = m.apply(params, x)
    assert y.shape == (2, 7, 32)
    y2 = m.apply(params, x, is_causal=True)
    assert y2.shape == (2, 7, 32)


def test_mha_with_cache_cross_attention():
    m = MultiHeadAttentionWithCache(dim_q=32, dim_kv=16, num_heads=4)
    q = jnp.ones((2, 5, 32))
    kv = jnp.ones((2, 9, 16))
    params = m.init(rng(), q, kv, kv)
    y = m.apply(params, q, kv, kv)
    assert y.shape == (2, 5, 32)


def test_mha_cache_decode_equivalence():
    """Decoding one token at a time with cache == full forward (causal)."""
    m = MultiHeadAttentionWithCache(dim_q=16, dim_kv=16, num_heads=2)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 16).astype(np.float32))
    params = m.init(rng(), x, x, x)
    full = m.apply(params, x, x, x, is_causal=True)

    cache = None
    outs = []
    for t in range(4):
        step = x[:, t : t + 1]
        out = m.apply(params, step, step, step, past_key_value=cache, use_cache=True)
        outs.append(out.attn_output)
        cache = out.past_key_value
    assert_expected(jnp.concatenate(outs, axis=1), full, rtol=1e-4, atol=1e-4)


def test_transformer_encoder_prenorm_postnorm():
    for norm_first in (True, False):
        enc = TransformerEncoder(
            n_layer=2, d_model=32, n_head=4, dim_feedforward=64,
            norm_first=norm_first, final_layer_norm_eps=1e-12,
        )
        x = jnp.ones((2, 5, 32))
        params = enc.init(rng(), x)
        out = enc.apply(params, x, return_hidden_states=True)
        assert out.last_hidden_state.shape == (2, 5, 32)
        assert len(out.hidden_states) == 3


def test_transformer_decoder_cache_and_cross_attn():
    dec = TransformerDecoder(
        n_layer=2, d_model=32, n_head=4, dim_feedforward=64,
        use_cross_attention=True, dim_kv=16, norm_first=True,
    )
    x = jnp.ones((2, 5, 32))
    enc_out = jnp.ones((2, 7, 16))
    params = dec.init(rng(), x, enc_out)
    out = dec.apply(params, x, enc_out, use_cache=True, is_causal=True)
    assert out.last_hidden_state.shape == (2, 5, 32)
    assert len(out.current_key_values) == 2
    assert out.current_key_values[0][0].shape == (2, 4, 5, 8)


def test_patch_embeddings():
    pe = PatchEmbeddings(image_size=32, patch_size=8, hidden_size=24)
    x = jnp.ones((2, 32, 32, 3))
    params = pe.init(rng(), x)
    out = pe.apply(params, x)
    assert out.embeddings.shape == (2, 17, 24)  # 16 patches + CLS

    pe2 = PatchEmbeddings(
        image_size=32, patch_size=8, hidden_size=24, patch_drop_rate=0.5
    )
    params2 = pe2.init(rng(), x)
    out2 = pe2.apply(
        params2, x, deterministic=False, rngs={"patch_drop": rng(1)}
    )
    assert out2.embeddings.shape == (2, 9, 24)  # 8 kept + CLS
    assert out2.random_mask.shape == (2, 16)
    assert_expected(jnp.sum(out2.random_mask), 16.0)  # 8 masked per sample


def test_random_masking():
    x = jnp.asarray(np.arange(2 * 8 * 4, dtype=np.float32).reshape(2, 8, 4))
    out = random_masking(rng(0), x, mask_ratio=0.75)
    assert out.x_masked.shape == (2, 2, 4)
    assert out.mask.shape == (2, 8)
    assert_expected(jnp.sum(out.mask, axis=1), np.array([6.0, 6.0]))
    # restore semantics: gathering kept tokens at mask==0 positions
    restored_mask = jnp.take_along_axis(out.mask, out.ids_restore, axis=1)
    assert restored_mask.shape == (2, 8)


def test_broadcasted_position_embedding():
    pe = BroadcastedPositionEmbedding(latent_shape=(2, 3), embedding_dim=6)
    pos = jnp.array([[0, 1, 5]])
    params = pe.init(rng(), pos)
    out = pe.apply(params, pos)
    assert out.shape == (1, 3, 6)
    d0 = params["params"]["d_0"]
    d1 = params["params"]["d_1"]
    expected_last = jnp.concatenate([d0[1], d1[2]])  # flat pos 5 -> (1, 2)
    assert_expected(out[0, 2], expected_last)


def test_sinusoidal_position_embeddings():
    pe = SinusoidalPositionEmbeddings(embed_dim=8)
    t = jnp.array([0.0, 1.0, 10.0])
    out = pe.apply({}, t)
    assert out.shape == (3, 8)
    assert_expected(out[0], np.array([0, 0, 0, 0, 1, 1, 1, 1], dtype=np.float32))


def test_bert_text_embeddings():
    emb = BERTTextEmbeddings(hidden_size=16, vocab_size=100, max_position_embeddings=32)
    ids = jnp.array([[1, 2, 3, 0]])
    params = emb.init(rng(), ids)
    out = emb.apply(params, ids)
    assert out.shape == (1, 4, 16)


def test_codebook_ema_and_lookup():
    cb = Codebook(num_embeddings=8, embedding_dim=4)
    z = jnp.asarray(np.random.RandomState(0).randn(2, 3, 4).astype(np.float32))
    variables = cb.init({"params": rng(0), "vq": rng(1)}, z, deterministic=False)
    out, new_vars = cb.apply(
        variables, z, deterministic=False,
        rngs={"vq": rng(2)}, mutable=["vq_stats"],
    )
    assert out.quantized.shape == z.shape
    assert out.codebook_indices.shape == (2, 3)
    assert bool(new_vars["vq_stats"]["is_init"])
    # eval: indices consistent with lookup
    out2 = cb.apply({**variables, **new_vars}, z)
    looked = cb.apply(
        {**variables, **new_vars}, out2.codebook_indices, method=Codebook.lookup
    )
    assert looked.shape == (2, 3, 4)
    # straight-through: gradient flows to encoder input
    g = jax.grad(
        lambda z_: jnp.sum(cb.apply({**variables, **new_vars}, z_).quantized ** 2)
    )(z)
    assert g.shape == z.shape
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_same_pad_conv3d():
    for stride in (1, 2, (1, 2, 2)):
        conv = SamePadConv3d(out_channels=6, kernel_size=3, stride=stride)
        x = jnp.ones((1, 4, 8, 8, 3))
        params = conv.init(rng(), x)
        y = conv.apply(params, x)
        s = (stride,) * 3 if isinstance(stride, int) else stride
        assert y.shape == (1, 4 // s[0] + (4 % s[0] > 0), 8 // s[1], 8 // s[2], 6)

    convt = SamePadConvTranspose3d(out_channels=6, kernel_size=4, stride=2)
    x = jnp.ones((1, 2, 4, 4, 3))
    y = convt.apply(convt.init(rng(), x), x)
    assert y.shape == (1, 4, 8, 8, 6)


def test_attention_pooler():
    pooler = AttentionPooler(
        input_embed_dim=16, output_embed_dim=24, n_head=4, n_queries=6
    )
    x = jnp.ones((2, 10, 16))
    params = pooler.init(rng(), x)
    y = pooler.apply(params, x)
    assert y.shape == (2, 6, 24)


def test_ndim_multihead_attention_full_and_axial():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 2, 3, 4, 16).astype(np.float32))
    mha = MultiHeadAttention(dim_q=16, dim_kv=16, n_head=4, attn_module=SelfAttention())
    params = mha.init(rng(), x)
    y = mha.apply(params, x)
    assert y.shape == x.shape

    axial = MultiHeadAttention(
        dim_q=16, dim_kv=16, n_head=4, attn_module=AxialAttention(axial_dim=1)
    )
    params2 = axial.init(rng(), x)
    y2 = axial.apply(params2, x)
    assert y2.shape == x.shape


def test_geglu():
    m = GEGLU(dim_out=8)
    x = jnp.ones((2, 4))
    y = m.apply(m.init(rng(), x), x)
    assert y.shape == (2, 8)
