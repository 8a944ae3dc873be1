import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.ops.attention import scaled_dot_product_attention
from multimodal_tpu.ops.flash_attention import flash_attention, flash_attention_forward

from tests.test_utils import assert_expected


def _ref_attention(q, k, v, bias=None, causal=False):
    d = q.shape[-1]
    s = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    if bias is not None:
        s = s + bias
    if causal:
        sq, sk = s.shape[-2:]
        mask = np.tril(np.ones((sq, sk), dtype=bool), k=sk - sq)
        s = np.where(mask, s, -1e30)
    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sq,sk", [(128, 128), (200, 120), (64, 256)])
def test_flash_matches_reference(causal, sq, sk):
    rng = np.random.RandomState(0)
    q = rng.randn(1, 2, sq, 64).astype(np.float32)
    k = rng.randn(1, 2, sk, 64).astype(np.float32)
    v = rng.randn(1, 2, sk, 64).astype(np.float32)
    out = flash_attention_forward(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal)
    ref = _ref_attention(q, k, v, causal=causal)
    # Rows with no attendable key (causal, sq > sk) are 0 in the kernel but an
    # arbitrary uniform average in the naive reference — skip them.
    first_valid = max(0, sq - sk) if causal else 0
    assert_expected(out[:, :, first_valid:], ref[:, :, first_valid:], rtol=2e-4, atol=2e-4)


def test_flash_with_bias():
    rng = np.random.RandomState(1)
    q = rng.randn(2, 2, 96, 32).astype(np.float32)
    k = rng.randn(2, 2, 80, 32).astype(np.float32)
    v = rng.randn(2, 2, 80, 32).astype(np.float32)
    bias = (rng.rand(2, 1, 96, 80) > 0.5).astype(np.float32) * -1e9
    out = flash_attention_forward(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias)
    )
    ref = _ref_attention(q, k, v, bias=bias)
    assert_expected(out, ref, rtol=2e-4, atol=2e-4)


def test_flash_grad_matches_xla():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 1, 64, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 64, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 1, 64, 32).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, True, None) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(
            scaled_dot_product_attention(q, k, v, is_causal=True) ** 2
        )

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert_expected(a, b, rtol=1e-3, atol=1e-3)


def test_sdpa_mask_and_dropout():
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(2, 4, 10, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 4, 12, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 4, 12, 16).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 1, 10, 12) > 0.3)
    out, probs = scaled_dot_product_attention(q, k, v, mask=mask, return_probs=True)
    assert out.shape == (2, 4, 10, 16)
    # masked positions carry ~zero probability
    assert float(jnp.max(jnp.where(mask, 0.0, probs))) < 1e-12
    # dropout path runs
    out2 = scaled_dot_product_attention(
        q, k, v, dropout_rate=0.5, dropout_rng=jax.random.PRNGKey(0)
    )
    assert out2.shape == out.shape

@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sq,sk", [(128, 128), (200, 120), (64, 256), (77, 77)])
def test_flash_backward_blockwise(causal, sq, sk):
    """Pallas dq/dk/dv (multi-block: block 64 forces the online loops) == XLA."""
    from multimodal_tpu.ops import flash_attention as fa

    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(2, 2, sq, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 2, sk, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 2, sk, 32).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 2, sq, 32).astype(np.float32))
    # Rows with no attendable key (causal, sq > sk) are ill-defined in the
    # naive reference (uniform softmax over -1e30 logits); zero their
    # cotangent so neither path picks up contributions from them.
    first = max(0, sq - sk) if causal else 0
    if first:
        g = g.at[:, :, :first].set(0.0)

    out, lse = fa.flash_attention_forward(
        q, k, v, None, causal=causal, block_q=64, block_k=64, return_lse=True
    )
    dq, dk, dv = fa._flash_backward(
        q, k, v, out, lse, g, causal=causal, sm_scale=None, block_q=64, block_k=64
    )

    def loss(q, k, v):
        return jnp.sum(fa._xla_attention(q, k, v, None, causal, None) * g)

    dq_ref, dk_ref, dv_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert_expected(dq[:, :, first:], dq_ref[:, :, first:], rtol=2e-3, atol=2e-3)
    assert_expected(dk, dk_ref, rtol=2e-3, atol=2e-3)
    assert_expected(dv, dv_ref, rtol=2e-3, atol=2e-3)


def test_flash_grad_with_bias_fallback():
    """Bias path still differentiates (XLA recompute fallback), incl. dbias."""
    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.randn(1, 2, 48, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 40, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 40, 16).astype(np.float32))
    bias = jnp.asarray(rng.randn(1, 2, 48, 40).astype(np.float32))

    def loss_flash(q, k, v, b):
        return jnp.sum(flash_attention(q, k, v, b, False, None) ** 2)

    def loss_xla(q, k, v, b):
        from multimodal_tpu.ops.flash_attention import _xla_attention
        return jnp.sum(_xla_attention(q, k, v, b, False, None) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g1, g2):
        assert_expected(a, b, rtol=1e-3, atol=1e-3)


def test_flash_backward_no_quadratic_buffer():
    """The jaxpr of the bias-free backward must not contain an (Sq, Sk)
    intermediate — the round-1 XLA-recompute backward materialized one."""
    sq = sk = 1024
    q = jnp.zeros((1, 1, sq, 32))

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, True, None))

    jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(q, q, q)
    quad = [
        v for eqn in jaxpr.jaxpr.eqns for v in eqn.outvars
        if hasattr(v, "aval") and getattr(v.aval, "shape", ())[-2:] == (sq, sk)
    ]
    assert not quad, f"backward materializes {len(quad)} (Sq,Sk) buffers"
