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
