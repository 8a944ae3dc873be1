import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_tpu.modules.fusions.attention_fusion import AttentionFusionModule
from multimodal_tpu.modules.fusions.concat_fusion import ConcatFusionModule
from multimodal_tpu.modules.fusions.deepset_fusion import (
    DeepsetFusionModule,
    deepset_transformer,
)
from multimodal_tpu.modules.layers.mlp import MLP
from multimodal_tpu.modules.losses.reconstruction_loss import reconstruction_loss
from multimodal_tpu.modules.losses.vqvae import commitment_loss
from multimodal_tpu.modules.optimizers.anyprecision import anyprecision_adamw

from tests.test_utils import assert_expected, rng


def test_concat_fusion():
    m = ConcatFusionModule()
    emb = {"b": jnp.ones((2, 3)), "a": jnp.zeros((2, 2))}
    out = m.apply({}, emb)
    assert out.shape == (2, 5)
    # sorted by key: 'a' first
    assert_expected(out[:, :2], np.zeros((2, 2)))


def test_attention_fusion():
    m = AttentionFusionModule({"img": 8, "txt": 6})
    emb = {"img": jnp.ones((2, 8)), "txt": jnp.ones((2, 6))}
    params = m.init(rng(), emb)
    out = m.apply(params, emb)
    assert out.shape == (2, 6)


def test_deepset_fusion_and_transformer():
    mlp = MLP(in_dim=8, out_dim=4, dropout=0.0)
    m = DeepsetFusionModule(
        {"img": 8, "txt": 8}, mlp, jnp.sum, apply_attention=True
    )
    emb = {"img": jnp.ones((2, 8)), "txt": jnp.ones((2, 8))}
    params = m.init(rng(), emb)
    out = m.apply(params, emb)
    assert out.shape == (2, 4)

    m2 = deepset_transformer({"img": 8, "txt": 8}, mlp)
    params2 = m2.init(rng(), emb)
    out2 = m2.apply(params2, emb)
    assert out2.shape == (2, 4)


def test_reconstruction_loss():
    pred = jnp.zeros((2, 4, 6))
    target = jnp.ones((2, 4, 6))
    mask = jnp.asarray([[1, 0, 0, 0], [0, 0, 0, 1]], jnp.float32)
    # normalized target is 0 (constant), so loss = 0
    assert_expected(reconstruction_loss(pred, target, mask), 0.0)
    # unnormalized: MSE 1 on masked patches
    assert_expected(
        reconstruction_loss(pred, target, mask, normalize_target=False), 1.0
    )


def test_commitment_loss_grad_only_encoder():
    q = jnp.ones((2, 4))
    e = jnp.zeros((2, 4))
    assert_expected(commitment_loss(q, e), 1.0)
    gq, ge = jax.grad(commitment_loss, argnums=(0, 1))(q, e)
    assert_expected(gq, np.zeros((2, 4)))  # quantized detached
    assert float(jnp.sum(jnp.abs(ge))) > 0


def test_anyprecision_adamw_matches_adamw_fp32():
    params = {"w": jnp.asarray(np.random.RandomState(0).randn(4, 4), jnp.float32)}
    grads = {"w": jnp.asarray(np.random.RandomState(1).randn(4, 4), jnp.float32)}

    tx = anyprecision_adamw(1e-2, weight_decay=0.01, momentum_dtype=jnp.float32,
                            variance_dtype=jnp.float32)
    ref = optax.adamw(1e-2, weight_decay=0.01)

    s1, s2 = tx.init(params), ref.init(params)
    p1, p2 = params, params
    for _ in range(5):
        u1, s1 = tx.update(grads, s1, p1)
        p1 = optax.apply_updates(p1, u1)
        u2, s2 = ref.update(grads, s2, p2)
        p2 = optax.apply_updates(p2, u2)
    assert_expected(p1["w"], p2["w"], rtol=1e-4, atol=1e-5)


def test_anyprecision_kahan_bf16_tracks_fp32():
    """bf16 params + Kahan tracks fp32 training better than plain bf16."""
    w0 = np.random.RandomState(0).randn(64).astype(np.float32) * 0.1
    g = np.random.RandomState(1).randn(64).astype(np.float32) * 1e-3

    def run(dtype, kahan):
        params = {"w": jnp.asarray(w0, dtype)}
        tx = anyprecision_adamw(1e-4, use_kahan_summation=kahan)
        s = tx.init(params)
        p = params
        for _ in range(50):
            u, s = tx.update({"w": jnp.asarray(g, dtype)}, s, p)
            p = optax.apply_updates(p, u)
        return np.asarray(p["w"], np.float32)

    fp32 = run(jnp.float32, False)
    bf16_kahan = run(jnp.bfloat16, True)
    bf16_plain = run(jnp.bfloat16, False)
    err_kahan = np.abs(bf16_kahan - fp32).mean()
    err_plain = np.abs(bf16_plain - fp32).mean()
    assert err_kahan <= err_plain + 1e-7, (err_kahan, err_plain)


def test_mil_encoder():
    """Multiple-instance learning: shared encoder per partition + deepset pool."""
    import flax.linen as nn

    from multimodal_tpu.modules.encoders.mil_encoder import MILEncoder
    from multimodal_tpu.modules.layers.mlp import MLP

    enc = MILEncoder(
        partition_sizes=[3, 3, 3],
        shared_encoder=nn.Dense(6),
        shared_encoder_dim=6,
        mlp=MLP(in_dim=6, out_dim=4, hidden_dims=[8], dropout=0.0),
    )
    x = jnp.asarray(np.random.RandomState(0).rand(2, 9).astype(np.float32))
    params = enc.init(rng(0), x)
    out = enc.apply(params, x)
    assert out.shape == (2, 4)
    # wrong partition total raises
    import pytest
    with pytest.raises(ValueError):
        enc.apply(params, jnp.zeros((2, 10)))


def test_embedding_encoders():
    from multimodal_tpu.modules.encoders.embedding_encoder import (
        EmbeddingEncoder,
        WeightedEmbeddingEncoder,
    )

    ids = jnp.asarray(np.array([[1, 2, 3], [4, 5, 6]], np.int32))
    enc = EmbeddingEncoder(num_embeddings=10, embedding_dim=4, pooling_type="mean")
    params = enc.init(rng(0), ids)
    out = enc.apply(params, ids)
    assert out.shape == (2, 4)
    table = params["params"]["embedding"]["embedding"]
    want = np.asarray(table)[np.asarray(ids)].mean(axis=1)
    assert_expected(out, want, atol=1e-6)

    # hashing maps out-of-range ids into [1, num_embeddings - 1]
    hashed = EmbeddingEncoder(num_embeddings=10, embedding_dim=4, use_hash=True)
    params_h = hashed.init(rng(0), ids)
    out_h = hashed.apply(params_h, jnp.asarray([[123456, 7, 8]]))
    assert out_h.shape == (1, 4)

    w = jnp.asarray(np.array([[0.5, 0.0, 0.5], [1.0, 1.0, 0.0]], np.float32))
    wenc = WeightedEmbeddingEncoder(num_embeddings=3, embedding_dim=4)
    wparams = wenc.init(rng(1), w)
    wout = wenc.apply(wparams, w)
    wtable = np.asarray(wparams["params"]["embedding"]["embedding"])
    want_w = (wtable[None] * np.asarray(w)[..., None]).sum(axis=1)
    assert_expected(wout, want_w, atol=1e-6)
