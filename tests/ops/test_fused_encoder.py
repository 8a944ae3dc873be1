"""Fused short-seq encoder kernels (ops/fused_encoder): the Pallas
qkv-attention and MLP kernels must be numerically interchangeable with the
XLA path they replace (forward AND gradients), and the CLIP encoder layer
must produce identical results whichever path dispatches. Kernels run in
interpret mode on the CPU backend (forced via MMTPU_FORCE_FUSED_ENCODER)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.ops.fused_encoder import (
    _mlp_xla,
    _qkv_attention_xla,
    fused_encoder_available,
    fused_mlp,
    fused_qkv_attention,
)


@pytest.fixture(autouse=True)
def _force_fused(monkeypatch):
    monkeypatch.setenv("MMTPU_FORCE_FUSED_ENCODER", "1")
    # exercise the opt-in Pallas MLP backward tiers in this suite
    monkeypatch.setenv("MMTPU_FUSED_MLP_BWD", "1")


@pytest.mark.parametrize(
    "b,s,d,h,causal",
    [(4, 50, 96, 12, False), (4, 77, 64, 8, True), (2, 197, 96, 6, False),
     (3, 17, 48, 3, True)],
)
def test_fused_qkv_attention_matches_xla(b, s, d, h, causal):
    r = np.random.RandomState(0)
    qkv = jnp.asarray(r.randn(b, s, 3 * d), jnp.float32)
    out = fused_qkv_attention(qkv, h, causal)
    ref = _qkv_attention_xla(qkv, h, causal, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_qkv_attention_sm_scale():
    r = np.random.RandomState(1)
    qkv = jnp.asarray(r.randn(2, 25, 3 * 64), jnp.float32)
    out = fused_qkv_attention(qkv, 4, False, 0.5)
    ref = _qkv_attention_xla(qkv, 4, False, 0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_qkv_attention_grad_matches_xla():
    r = np.random.RandomState(2)
    qkv = jnp.asarray(r.randn(2, 26, 3 * 48), jnp.float32)

    def loss_k(t):
        return jnp.sum(jnp.sin(fused_qkv_attention(t, 6, True)))

    def loss_x(t):
        return jnp.sum(jnp.sin(_qkv_attention_xla(t, 6, True, None)))

    gk = jax.grad(loss_k)(qkv)
    gx = jax.grad(loss_x)(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), atol=2e-5)


@pytest.mark.parametrize("act", ["quick_gelu", "gelu", "silu"])
def test_fused_mlp_matches_xla(act):
    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(4, 19, 64), jnp.float32)
    w1 = jnp.asarray(r.randn(64, 256) * 0.05, jnp.float32)
    b1 = jnp.asarray(r.randn(256) * 0.01, jnp.float32)
    w2 = jnp.asarray(r.randn(256, 64) * 0.05, jnp.float32)
    b2 = jnp.asarray(r.randn(64) * 0.01, jnp.float32)
    out = fused_mlp(x, w1, b1, w2, b2, act)
    ref = _mlp_xla(x, w1, b1, w2, b2, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_mlp_grads_match_xla():
    r = np.random.RandomState(4)
    x = jnp.asarray(r.randn(2, 9, 32), jnp.float32)
    w1 = jnp.asarray(r.randn(32, 128) * 0.1, jnp.float32)
    b1 = jnp.zeros(128, jnp.float32)
    w2 = jnp.asarray(r.randn(128, 32) * 0.1, jnp.float32)
    b2 = jnp.zeros(32, jnp.float32)

    def lk(*a):
        return jnp.sum(fused_mlp(*a, "quick_gelu") ** 2)

    def lx(*a):
        return jnp.sum(_mlp_xla(*a, "quick_gelu") ** 2)

    gk = jax.grad(lk, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gx = jax.grad(lx, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_mlp_falls_back_when_weights_exceed_vmem():
    # d_ff large enough that resident weights leave no useful row block:
    # must produce the XLA result (fallback), not an error
    r = np.random.RandomState(5)
    x = jnp.asarray(r.randn(2, 4, 1024), jnp.float32)
    w1 = jnp.asarray(r.randn(1024, 4096) * 0.02, jnp.float32)
    b1 = jnp.zeros(4096, jnp.float32)
    w2 = jnp.asarray(r.randn(4096, 1024) * 0.02, jnp.float32)
    b2 = jnp.zeros(1024, jnp.float32)
    out = fused_mlp(x, w1, b1, w2, b2, "gelu")
    ref = _mlp_xla(x, w1, b1, w2, b2, "gelu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_clip_layer_identical_fused_vs_unfused(monkeypatch):
    """The CLIP encoder layer must compute the same function whichever path
    dispatch picks — same params, same input, fused (interpret Pallas) vs
    plain XLA."""
    from multimodal_tpu.models.clip.transformer import CLIPEncoderLayer

    layer = CLIPEncoderLayer(width=96, heads=6, dim_feedforward=384)
    x = jnp.asarray(np.random.RandomState(6).randn(2, 50, 96), jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("MMTPU_FORCE_FUSED_ENCODER", "1")
    fused_out = layer.apply(params, x, is_causal=True)
    monkeypatch.delenv("MMTPU_FORCE_FUSED_ENCODER")
    monkeypatch.setenv("MMTPU_DISABLE_FUSED_ENCODER", "1")
    plain_out = layer.apply(params, x, is_causal=True)
    np.testing.assert_allclose(
        np.asarray(fused_out), np.asarray(plain_out), atol=2e-5
    )


def test_availability_gates():
    os.environ.pop("MMTPU_FORCE_FUSED_ENCODER", None)
    assert not fused_encoder_available(512, 768, 12)  # too long
    assert not fused_encoder_available(50, 770, 12)   # ragged heads
    os.environ["MMTPU_DISABLE_FUSED_ENCODER"] = "1"
    try:
        assert not fused_encoder_available(50, 768, 12)
    finally:
        del os.environ["MMTPU_DISABLE_FUSED_ENCODER"]


# ---------------------------------------------------------------------------
# round 4: key-padding bias lane + generic-module (MHSA / MLP) dispatch
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("causal", [False, True])
def test_fused_qkv_attention_key_bias_matches_xla(causal):
    from multimodal_tpu.ops.fused_encoder import key_padding_bias

    r = np.random.RandomState(7)
    b, s, d, h = 3, 41, 96, 6
    qkv = jnp.asarray(r.randn(b, s, 3 * d), jnp.float32)
    valid = jnp.asarray(r.rand(b, s) > 0.3)
    valid = valid.at[:, 0].set(True)  # at least one attendable key per row
    kb = key_padding_bias(valid[:, None, None, :], b, s)
    assert kb is not None and kb.shape == (b, s)
    out = fused_qkv_attention(qkv, h, causal, None, kb)
    ref = _qkv_attention_xla(qkv, h, causal, None, kb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_qkv_attention_key_bias_grad_matches_xla():
    from multimodal_tpu.ops.fused_encoder import key_padding_bias

    r = np.random.RandomState(8)
    b, s, d, h = 2, 23, 48, 6
    qkv = jnp.asarray(r.randn(b, s, 3 * d), jnp.float32)
    valid = jnp.asarray(r.rand(b, s) > 0.4).at[:, 0].set(True)
    kb = key_padding_bias(valid[:, None, None, :], b, s)

    gk = jax.grad(lambda t: jnp.sum(jnp.sin(
        fused_qkv_attention(t, h, False, None, kb))))(qkv)
    gx = jax.grad(lambda t: jnp.sum(jnp.sin(
        _qkv_attention_xla(t, h, False, None, kb))))(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), atol=2e-5)


def test_key_padding_bias_rejects_unfusable_masks():
    from multimodal_tpu.ops.fused_encoder import key_padding_bias

    full = jnp.ones((2, 1, 7, 7), bool)       # per-query structure
    assert key_padding_bias(full, 2, 7) is None
    per_head = jnp.zeros((2, 4, 1, 7), jnp.float32)
    assert key_padding_bias(per_head, 2, 7) is None
    ok = jnp.ones((1, 1, 1, 7), bool)          # broadcast batch
    kb = key_padding_bias(ok, 3, 7)
    assert kb is not None and kb.shape == (3, 7)


def test_mhsa_module_identical_fused_vs_unfused(monkeypatch):
    """MultiHeadSelfAttention (the FLAVA/BERT/ViT tower attention) must
    compute the same function whichever path dispatch picks — including a
    BERT-style bool (b, 1, 1, s) key-padding mask."""
    from multimodal_tpu.modules.layers.multi_head_attention import (
        MultiHeadSelfAttention,
    )

    r = np.random.RandomState(9)
    b, s, d = 2, 31, 96
    mod = MultiHeadSelfAttention(embed_dim=d, num_heads=6)
    x = jnp.asarray(r.randn(b, s, d), jnp.float32)
    mask = jnp.asarray(r.rand(b, s) > 0.25).at[:, 0].set(True)[:, None, None, :]
    params = mod.init(jax.random.PRNGKey(0), x)

    for m in (None, mask):
        monkeypatch.setenv("MMTPU_FORCE_FUSED_ENCODER", "1")
        fused_out = mod.apply(params, x, attn_mask=m)
        monkeypatch.delenv("MMTPU_FORCE_FUSED_ENCODER")
        monkeypatch.setenv("MMTPU_DISABLE_FUSED_ENCODER", "1")
        plain_out = mod.apply(params, x, attn_mask=m)
        monkeypatch.delenv("MMTPU_DISABLE_FUSED_ENCODER")
        np.testing.assert_allclose(
            np.asarray(fused_out), np.asarray(plain_out), atol=2e-5
        )


def test_mhsa_grad_identical_fused_vs_unfused(monkeypatch):
    from multimodal_tpu.modules.layers.multi_head_attention import (
        MultiHeadSelfAttention,
    )

    r = np.random.RandomState(10)
    b, s, d = 2, 19, 48
    mod = MultiHeadSelfAttention(embed_dim=d, num_heads=6)
    x = jnp.asarray(r.randn(b, s, d), jnp.float32)
    mask = jnp.asarray(r.rand(b, s) > 0.3).at[:, 0].set(True)[:, None, None, :]
    params = mod.init(jax.random.PRNGKey(0), x)

    def loss(p, env):
        return jnp.sum(mod.apply(p, x, attn_mask=mask) ** 2)

    monkeypatch.setenv("MMTPU_FORCE_FUSED_ENCODER", "1")
    g_fused = jax.grad(loss)(params, "f")
    monkeypatch.delenv("MMTPU_FORCE_FUSED_ENCODER")
    monkeypatch.setenv("MMTPU_DISABLE_FUSED_ENCODER", "1")
    g_plain = jax.grad(loss)(params, "p")
    monkeypatch.delenv("MMTPU_DISABLE_FUSED_ENCODER")
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), atol=3e-5
        ),
        g_fused, g_plain,
    )


@pytest.mark.parametrize("act", ["gelu", "gelu_tanh", "quick_gelu", "relu"])
def test_mlp_module_identical_fused_vs_unfused(monkeypatch, act):
    """The generic MLP (every transformer block's feed-forward) must compute
    the same function on both paths — in particular the library's exact
    'gelu' must map to the kernel's 'gelu_exact', not its tanh 'gelu'."""
    from multimodal_tpu.modules.layers.mlp import MLP

    r = np.random.RandomState(11)
    mod = MLP(in_dim=128, out_dim=128, hidden_dims=256, dropout=0.0,
              activation=act)
    x = jnp.asarray(r.randn(2, 9, 128), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("MMTPU_FORCE_FUSED_ENCODER", "1")
    fused_out = mod.apply(params, x)
    monkeypatch.delenv("MMTPU_FORCE_FUSED_ENCODER")
    monkeypatch.setenv("MMTPU_DISABLE_FUSED_ENCODER", "1")
    plain_out = mod.apply(params, x)
    monkeypatch.delenv("MMTPU_DISABLE_FUSED_ENCODER")
    np.testing.assert_allclose(
        np.asarray(fused_out), np.asarray(plain_out), atol=2e-5
    )


def test_mlp_param_tree_stable_across_paths(monkeypatch):
    """Dispatch must not change the parameter tree or its init values —
    checkpoints and sharding rules address hidden_0/out regardless of path."""
    from multimodal_tpu.modules.layers.mlp import MLP

    x = jnp.zeros((2, 5, 128), jnp.float32)
    mod = MLP(in_dim=128, out_dim=128, hidden_dims=256, dropout=0.1,
              activation="gelu")
    monkeypatch.setenv("MMTPU_DISABLE_FUSED_ENCODER", "1")
    p_plain = mod.init(jax.random.PRNGKey(3), x)
    monkeypatch.delenv("MMTPU_DISABLE_FUSED_ENCODER")
    monkeypatch.setenv("MMTPU_FORCE_FUSED_ENCODER", "1")
    p_fused = mod.init(jax.random.PRNGKey(3), x)
    monkeypatch.delenv("MMTPU_FORCE_FUSED_ENCODER")
    assert jax.tree_util.tree_structure(p_plain) == jax.tree_util.tree_structure(p_fused)
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_array_equal(np.asarray(a), np.asarray(c)),
        p_plain, p_fused,
    )


def test_encoder_layer_identical_fused_vs_unfused(monkeypatch):
    """FLAVA-shape TransformerEncoderLayer end to end (pre-norm, exact gelu,
    key-padding mask): fused dispatch == XLA path, forward and gradients."""
    from multimodal_tpu.modules.layers.transformer import TransformerEncoderLayer

    r = np.random.RandomState(12)
    b, s, d = 2, 29, 128
    layer = TransformerEncoderLayer(
        d_model=d, n_head=8, dim_feedforward=256, dropout=0.0,
        activation="gelu", norm_first=True,
    )
    x = jnp.asarray(r.randn(b, s, d), jnp.float32)
    mask = jnp.asarray(r.rand(b, s) > 0.2).at[:, 0].set(True)[:, None, None, :]
    params = layer.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.sum(layer.apply(p, x, mask) ** 2)

    monkeypatch.setenv("MMTPU_FORCE_FUSED_ENCODER", "1")
    out_f, g_f = layer.apply(params, x, mask), jax.grad(loss)(params)
    monkeypatch.delenv("MMTPU_FORCE_FUSED_ENCODER")
    monkeypatch.setenv("MMTPU_DISABLE_FUSED_ENCODER", "1")
    out_p, g_p = layer.apply(params, x, mask), jax.grad(loss)(params)
    monkeypatch.delenv("MMTPU_DISABLE_FUSED_ENCODER")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p), atol=3e-5)
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), atol=1e-4
        ),
        g_f, g_p,
    )


# ---------------------------------------------------------------------------
# round 5: blockwise Pallas MLP backward (no fp32 (rows, d_ff) HBM staging)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "act", ["quick_gelu", "gelu", "gelu_exact", "relu", "silu"]
)
def test_fused_mlp_pallas_backward_matches_xla(act):
    """Lane-aligned dims route the backward through _mlp_bwd_pallas (the
    row-block kernel); all five grads must match jax.vjp of the XLA path."""
    from multimodal_tpu.ops.fused_encoder import _mlp_bwd_pallas, fused_mlp_available

    assert fused_mlp_available(128, 256, 128)
    r = np.random.RandomState(20)
    x = jnp.asarray(r.randn(3, 18, 128), jnp.float32)  # rows=54, not % rb
    w1 = jnp.asarray(r.randn(128, 256) * 0.05, jnp.float32)
    b1 = jnp.asarray(r.randn(256) * 0.01, jnp.float32)
    w2 = jnp.asarray(r.randn(256, 128) * 0.05, jnp.float32)
    b2 = jnp.asarray(r.randn(128) * 0.01, jnp.float32)
    # the staged kernel must actually engage at these shapes
    assert _mlp_bwd_pallas(
        x.reshape(-1, 128), jnp.zeros((54, 128), jnp.float32), w1, b1, w2, act
    ) is not None

    def lk(*a):
        return jnp.sum(jnp.sin(fused_mlp(*a, act)))

    def lx(*a):
        return jnp.sum(jnp.sin(_mlp_xla(*a, act)))

    gk = jax.grad(lk, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gx = jax.grad(lx, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
        )


def test_fused_mlp_backward_fallback_when_weights_exceed_vmem():
    """Oversized weights: backward must take the XLA-vjp fallback and still
    produce correct grads (mirrors the forward's fallback test)."""
    r = np.random.RandomState(21)
    x = jnp.asarray(r.randn(2, 4, 1024), jnp.float32)
    w1 = jnp.asarray(r.randn(1024, 4096) * 0.02, jnp.float32)
    b1 = jnp.zeros(4096, jnp.float32)
    w2 = jnp.asarray(r.randn(4096, 1024) * 0.02, jnp.float32)
    b2 = jnp.zeros(1024, jnp.float32)
    gk = jax.grad(lambda *a: jnp.sum(fused_mlp(*a, "gelu") ** 2),
                  argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gx = jax.grad(lambda *a: jnp.sum(_mlp_xla(*a, "gelu") ** 2),
                  argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
        )


def test_fused_mlp_acc_backward_multiblock_ragged():
    """The accumulating single-kernel backward (dW summed across row-block
    grid steps in VMEM) with >1 grid step and a ragged tail: padding rows
    must not leak into dW/db."""
    from multimodal_tpu.ops.fused_encoder import _mlp_bwd_acc_pallas

    r = np.random.RandomState(22)
    rows = 300  # 3 blocks of 128 with a 44-row tail
    x = jnp.asarray(r.randn(rows, 128), jnp.float32)
    g = jnp.asarray(r.randn(rows, 128), jnp.float32)
    w1 = jnp.asarray(r.randn(128, 256) * 0.05, jnp.float32)
    b1 = jnp.asarray(r.randn(256) * 0.01, jnp.float32)
    w2 = jnp.asarray(r.randn(256, 128) * 0.05, jnp.float32)
    out = _mlp_bwd_acc_pallas(x, g, w1, b1, w2, "quick_gelu")
    assert out is not None
    dx, dw1, dw2, db1 = out

    def f(x, w1, b1, w2):
        h = (x @ w1 + b1).astype(jnp.float32)
        h = (h * jax.nn.sigmoid(1.702 * h)).astype(x.dtype)
        return h @ w2

    _, vjp = jax.vjp(f, x, w1, b1, w2)
    rdx, rdw1, rdb1, rdw2 = vjp(g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rdx), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(rdw1), atol=2e-3)
    np.testing.assert_allclose(np.asarray(dw2), np.asarray(rdw2), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(db1[0]), np.asarray(rdb1), atol=2e-3
    )


def test_fused_mlp_staged_backward_tier(monkeypatch):
    """With the accumulating kernel unavailable (dW exceeds its VMEM
    budget), the staged two-kernel tier must serve the grads."""
    import multimodal_tpu.ops.fused_encoder as fe

    monkeypatch.setattr(fe, "_mlp_bwd_acc_pallas", lambda *a, **k: None)
    r = np.random.RandomState(23)
    x = jnp.asarray(r.randn(2, 70, 128), jnp.float32)
    w1 = jnp.asarray(r.randn(128, 256) * 0.05, jnp.float32)
    b1 = jnp.asarray(r.randn(256) * 0.01, jnp.float32)
    w2 = jnp.asarray(r.randn(256, 128) * 0.05, jnp.float32)
    b2 = jnp.asarray(r.randn(128) * 0.01, jnp.float32)
    gk = jax.grad(lambda *a: jnp.sum(jnp.sin(fe.fused_mlp(*a, "silu"))),
                  argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gx = jax.grad(lambda *a: jnp.sum(jnp.sin(fe._mlp_xla(*a, "silu"))),
                  argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
        )


def test_fused_qkv_attention_key_bias_partial_batch_blocks():
    """Shapes whose VMEM budget forces a batch block smaller than the batch
    (and not sublane-divisible): the key bias rides as a full-array block
    sliced per grid step — this failed to lower on TPU when the bias block
    was (bb, S) with bb % 8 != 0 (FLAVA-900m batch-64 text tower)."""
    from multimodal_tpu.ops.fused_encoder import _batch_block, key_padding_bias

    r = np.random.RandomState(30)
    b, s, d, h = 16, 256, 128, 8
    per_ex = s * (3 * d + d) * 4 + s * s * 4
    assert 1 < _batch_block(b, per_ex) < b  # the partial-block regime
    qkv = jnp.asarray(r.randn(b, s, 3 * d), jnp.float32)
    valid = jnp.asarray(r.rand(b, s) > 0.3).at[:, 0].set(True)
    kb = key_padding_bias(valid[:, None, None, :], b, s)
    out = fused_qkv_attention(qkv, h, False, None, kb)
    ref = _qkv_attention_xla(qkv, h, False, None, kb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    gk = jax.grad(lambda t: jnp.sum(jnp.cos(
        fused_qkv_attention(t, h, False, None, kb))))(qkv)
    gx = jax.grad(lambda t: jnp.sum(jnp.cos(
        _qkv_attention_xla(t, h, False, None, kb))))(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), atol=2e-5)
