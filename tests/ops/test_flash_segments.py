"""Segment-id masking and the lse-returning flash variant.

Round-3 additions (VERDICT r2 item 3): padded BERT-style batches keep the
blockwise Pallas backward via O(S) segment ids instead of the O(S^2) bias
fallback, and ``flash_attention_lse`` (the ring-attention building block) is
differentiable in both outputs. CPU runs exercise the kernels in Pallas
interpret mode — same code path as the TPU, minus Mosaic lowering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.ops.flash_attention import (
    DEFAULT_MASK_VALUE,
    LOG2E,
    flash_attention,
    flash_attention_lse,
)

from tests.test_utils import assert_expected, rng


def _dense_reference(q, k, v, mask=None, causal=False, scale=None):
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if causal:
        sq, sk = s.shape[-2], s.shape[-1]
        cm = jnp.tril(jnp.ones((sq, sk), bool), k=sk - sq)
        s = jnp.where(cm, s, DEFAULT_MASK_VALUE)
    if mask is not None:
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v), s


def _random_qkv(key, b=2, h=2, s=48, d=16):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32)
    return q, k, v


def _padding_segments(b, s, lengths):
    """Real tokens get id 1, padding id 0 (standard padded-batch layout)."""
    pos = np.arange(s)[None, :]
    return jnp.asarray((pos < np.asarray(lengths)[:, None]).astype(np.int32))


@pytest.mark.parametrize("causal", [False, True])
def test_segment_ids_match_dense_mask(causal):
    key = jax.random.PRNGKey(0)
    b, h, s, d = 2, 2, 48, 16
    q, k, v = _random_qkv(key, b, h, s, d)
    lengths = [37, 48]
    seg = _padding_segments(b, s, lengths)

    out = flash_attention(q, k, v, None, causal, None, seg, seg)

    mask = (seg[:, None, :, None] == seg[:, None, None, :])
    ref, _ = _dense_reference(q, k, v, mask=mask, causal=causal)
    assert_expected(out, ref, atol=2e-5, rtol=2e-5)


def test_segment_ids_gradients_match_dense():
    key = jax.random.PRNGKey(1)
    b, h, s, d = 2, 2, 40, 16
    q, k, v = _random_qkv(key, b, h, s, d)
    lengths = [29, 40]
    seg = _padding_segments(b, s, lengths)
    gw = jax.random.normal(jax.random.PRNGKey(9), (b, h, s, d))

    def flash_loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, False, None, seg, seg) * gw)

    def dense_loss(q, k, v):
        mask = seg[:, None, :, None] == seg[:, None, None, :]
        out, _ = _dense_reference(q, k, v, mask=mask)
        return jnp.sum(out * gw)

    g_flash = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
    for gf, gd in zip(g_flash, g_dense):
        assert_expected(gf, gd, atol=3e-5, rtol=3e-5)


def test_segment_ids_blockwise_at_multiblock_sizes():
    """Cross-block: sequence spans several k-blocks with tiny block sizes."""
    from multimodal_tpu.ops.flash_attention import flash_attention_forward

    key = jax.random.PRNGKey(2)
    b, h, s, d = 1, 1, 64, 8
    q, k, v = _random_qkv(key, b, h, s, d)
    seg_np = np.zeros((b, s), np.int32)
    seg_np[0, :20] = 1
    seg_np[0, 20:51] = 2  # packed-sequence style: two segments + pad tail
    seg = jnp.asarray(seg_np)

    out = flash_attention_forward(
        q, k, v, block_q=16, block_k=16,
        q_segment_ids=seg, kv_segment_ids=seg,
    )
    mask = seg[:, None, :, None] == seg[:, None, None, :]
    ref, _ = _dense_reference(q, k, v, mask=mask)
    assert_expected(out, ref, atol=2e-5, rtol=2e-5)


def test_lse_values_match_dense():
    key = jax.random.PRNGKey(3)
    q, k, v = _random_qkv(key, 1, 2, 32, 16)
    out, lse2 = flash_attention_lse(q, k, v)
    ref, s = _dense_reference(q, k, v)
    assert_expected(out, ref, atol=2e-5, rtol=2e-5)
    # dense lse in log2 space: logsumexp(s)/ln2
    ref_lse2 = jax.nn.logsumexp(s, axis=-1) * LOG2E
    assert_expected(lse2, ref_lse2, atol=2e-4, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_lse_gradients_flow_through_both_outputs(causal):
    """The ring merge differentiates through BOTH out and lse: check the
    custom backward against autodiff of the dense computation for a loss
    touching both."""
    key = jax.random.PRNGKey(4)
    q, k, v = _random_qkv(key, 1, 2, 32, 16)
    gw = jax.random.normal(jax.random.PRNGKey(5), q.shape)

    def flash_loss(q, k, v):
        out, lse2 = flash_attention_lse(q, k, v, causal)
        return jnp.sum(out * gw) + 0.3 * jnp.sum(jnp.tanh(lse2))

    def dense_loss(q, k, v):
        out, s = _dense_reference(q, k, v, causal=causal)
        lse2 = jax.nn.logsumexp(s, axis=-1) * LOG2E
        return jnp.sum(out * gw) + 0.3 * jnp.sum(jnp.tanh(lse2))

    g_flash = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
    for gf, gd in zip(g_flash, g_dense):
        assert_expected(gf, gd, atol=5e-5, rtol=5e-5)


def test_key_padding_mask_dispatches_to_segment_flash(monkeypatch):
    """scaled_dot_product_attention converts a (b, 1, 1, sk) boolean
    key-padding mask to segment ids so padded towers keep the Pallas
    backward (no dense-bias fallback)."""
    import multimodal_tpu.ops.attention as attn_mod

    monkeypatch.setenv("MMTPU_FORCE_FLASH", "1")
    key = jax.random.PRNGKey(6)
    b, h, s, d = 2, 2, 32, 16
    q, k, v = _random_qkv(key, b, h, s, d)
    lengths = [21, 32]
    kp = _padding_segments(b, s, lengths).astype(bool)  # (b, sk) True=keep

    calls = {}
    orig = attn_mod.flash_attention

    def spy(*args, **kwargs):
        calls["args"] = args
        return orig(*args, **kwargs)

    monkeypatch.setattr(attn_mod, "flash_attention", spy)
    out = attn_mod.scaled_dot_product_attention(
        q, k, v, mask=kp[:, None, None, :]
    )
    assert "args" in calls, "flash path not taken"
    assert calls["args"][3] is None, "bias used instead of segment ids"
    assert calls["args"][6] is not None, "segment ids missing"

    mask = jnp.broadcast_to(kp[:, None, None, :], (b, h, s, s))
    ref, _ = _dense_reference(q, k, v, mask=mask)
    assert_expected(out, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_packed_segment_ids_through_dispatch(monkeypatch, causal):
    """Explicit packed-document segment_ids= through
    scaled_dot_product_attention: the flash route gets O(S) ids (no dense
    bias), matches the dense block-diagonal(-causal) reference, and the
    XLA fallback (no force flag) agrees."""
    import multimodal_tpu.ops.attention as attn_mod

    key = jax.random.PRNGKey(7)
    b, h, s, d = 2, 2, 48, 16
    q, k, v = _random_qkv(key, b, h, s, d)
    # packed rows: docs of different lengths + trailing padding (id 0)
    seg = jnp.asarray(
        np.stack([
            [1] * 20 + [2] * 20 + [0] * 8,
            [1] * 11 + [2] * 17 + [3] * 20,
        ]).astype(np.int32)
    )

    mask = (seg[:, None, :, None] == seg[:, None, None, :])
    ref, _ = _dense_reference(q, k, v, mask=mask, causal=causal)

    # XLA fallback path
    out_xla = attn_mod.scaled_dot_product_attention(
        q, k, v, is_causal=causal, segment_ids=seg
    )
    assert_expected(out_xla, ref, atol=2e-5, rtol=2e-5)

    # forced flash path: ids reach the kernel, bias stays None
    monkeypatch.setenv("MMTPU_FORCE_FLASH", "1")
    calls = {}
    orig = attn_mod.flash_attention

    def spy(*args, **kwargs):
        calls["args"] = args
        return orig(*args, **kwargs)

    monkeypatch.setattr(attn_mod, "flash_attention", spy)
    out_flash = attn_mod.scaled_dot_product_attention(
        q, k, v, is_causal=causal, segment_ids=seg
    )
    assert calls["args"][3] is None, "dense bias used for packed ids"
    assert calls["args"][6] is not None
    assert_expected(out_flash, ref, atol=2e-5, rtol=2e-5)
