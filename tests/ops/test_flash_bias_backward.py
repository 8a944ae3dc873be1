"""Blockwise biased backward (VERDICT r3 item 6): the flash kernel keeps its
FlashAttention-2 backward under a true additive bias — broadcast biases
(ALiBi-style) never materialize, bias composes with segment ids, dq/dk/dv
and dbias match the XLA dense reference, and a bias that is NOT
differentiated leaves no (Sq, Sk) buffer in the backward jaxpr."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.ops.flash_attention import (
    _xla_attention,
    flash_attention,
)

from tests.test_utils import assert_expected


def _rand(shape, seed):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32)
    )


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "bias_shape",
    [(2, 2, 96, 96), (1, 2, 1, 96), (2, 1, 96, 96), (1, 1, 96, 1)],
)
def test_biased_backward_matches_xla_dense(causal, bias_shape):
    """dq/dk/dv AND dbias from the blockwise kernels == the dense XLA vjp,
    for full and broadcast (ALiBi-like (1,H,1,Sk)) bias shapes."""
    q, k, v = _rand((2, 2, 96, 32), 0), _rand((2, 2, 96, 32), 1), _rand((2, 2, 96, 32), 2)
    bias = _rand(bias_shape, 3)

    def flash_loss(q, k, v, b):
        return jnp.sum(flash_attention(q, k, v, b, causal, None) ** 2)

    def dense_loss(q, k, v, b):
        return jnp.sum(_xla_attention(q, k, v, b, causal, None) ** 2)

    got = jax.grad(flash_loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
    want = jax.grad(dense_loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for g, w, name in zip(got, want, ("dq", "dk", "dv", "dbias")):
        assert g.shape == w.shape, name
        assert_expected(g, w, rtol=2e-3, atol=2e-3)


def test_bias_composes_with_segment_ids():
    """Packed segments + an extra additive bias run through the flash
    kernels together (fwd + bwd) and match the dense computation."""
    b, h, s, d = 2, 2, 96, 32
    q, k, v = _rand((b, h, s, d), 4), _rand((b, h, s, d), 5), _rand((b, h, s, d), 6)
    seg = jnp.asarray(
        np.repeat(np.arange(4), s // 4)[None, :].repeat(b, 0), jnp.int32
    )
    bias = _rand((1, h, 1, s), 7)  # ALiBi-like per-head key bias

    def flash_loss(q, k, v, bias):
        return jnp.sum(flash_attention(q, k, v, bias, True, None, seg, seg) ** 2)

    def dense_loss(q, k, v, bias):
        seg_bias = jnp.where(
            seg[:, None, :, None] == seg[:, None, None, :], 0.0, -1e30
        )
        return jnp.sum(_xla_attention(q, k, v, bias + seg_bias, True, None) ** 2)

    got = jax.value_and_grad(flash_loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
    want = jax.value_and_grad(dense_loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
    assert_expected(got[0], want[0], rtol=2e-4, atol=2e-4)
    for g, w in zip(got[1], want[1]):
        assert_expected(g, w, rtol=2e-3, atol=2e-3)


def test_biased_backward_no_quadratic_buffer_when_bias_not_differentiated():
    """An O(S) broadcast bias that is not itself differentiated (the common
    ALiBi / padding-penalty case) must leave NO (Sq, Sk) buffer in the
    backward jaxpr — the VERDICT r3 'done' criterion. The dbias kernel only
    exists for callers that ask for the bias gradient."""
    sq = sk = 1024
    q = jnp.zeros((1, 2, sq, 32))
    bias = jnp.zeros((1, 2, 1, sk))  # O(S): per-head additive key bias

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, bias, True, None))

    jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(q, q, q)
    quad = [
        v for eqn in jaxpr.jaxpr.eqns for v in eqn.outvars
        if hasattr(v, "aval") and getattr(v.aval, "shape", ())[-2:] == (sq, sk)
    ]
    assert not quad, f"backward materializes {len(quad)} (Sq,Sk) buffers"


def test_broadcast_bias_not_materialized_in_forward():
    """The forward jaxpr keeps a broadcast bias at its broadcast shape: no
    (B, H, Sq, Sk) expansion before the kernel."""
    sq = sk = 1024
    q = jnp.zeros((2, 4, sq, 32))
    bias = jnp.zeros((1, 4, 1, sk))

    jaxpr = jax.make_jaxpr(
        lambda q, k, v: flash_attention(q, k, v, bias, False, None)
    )(q, q, q)
    quad = [
        v for eqn in jaxpr.jaxpr.eqns for v in eqn.outvars
        if hasattr(v, "aval") and getattr(v.aval, "shape", ())[-2:] == (sq, sk)
    ]
    assert not quad, f"forward materializes {len(quad)} (Sq,Sk) buffers"


@pytest.mark.parametrize("sq,sk", [(200, 120), (96, 160)])
def test_biased_backward_ragged_shapes(sq, sk):
    """Cross-attention shapes with padding blocks: biased grads still match
    dense."""
    q, k, v = _rand((1, 2, sq, 32), 8), _rand((1, 2, sk, 32), 9), _rand((1, 2, sk, 32), 10)
    bias = _rand((1, 2, sq, sk), 11)

    got = jax.grad(
        lambda *a: jnp.sum(flash_attention(*a, False, None) ** 2), (0, 1, 2, 3)
    )(q, k, v, bias)
    want = jax.grad(
        lambda *a: jnp.sum(_xla_attention(*a, False, None) ** 2), (0, 1, 2, 3)
    )(q, k, v, bias)
    for g, w in zip(got, want):
        assert_expected(g, w, rtol=2e-3, atol=2e-3)
