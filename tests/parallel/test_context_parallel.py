"""Context-parallel (ring) attention equivalence on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from multimodal_tpu.parallel.context_parallel import (
    context_parallel_attention,
    gather_kv_attention,
    zigzag_context_parallel_attention,
    zigzag_restore,
    zigzag_split,
)

from tests.test_utils import assert_expected


def _full_attention(q, k, v, causal=False):
    scale = q.shape[-1] ** -0.5
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if causal:
        sq, sk = q.shape[2], k.shape[2]
        s = np.where(np.arange(sq)[:, None] >= np.arange(sk)[None, :], s, -1e30)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


def test_ring_attention_matches_full():
    devs = jax.devices()[:8]
    mesh = Mesh(np.asarray(devs), ("cp",))
    rng = np.random.RandomState(0)
    q = rng.randn(2, 4, 64, 16).astype(np.float32)
    k = rng.randn(2, 4, 64, 16).astype(np.float32)
    v = rng.randn(2, 4, 64, 16).astype(np.float32)
    ref = _full_attention(q, k, v)

    for fn in (context_parallel_attention, gather_kv_attention):
        sharded = shard_map(
            lambda q_, k_, v_: fn(q_, k_, v_, "cp"),
            mesh=mesh,
            in_specs=(P(None, None, "cp"), P(None, None, "cp"), P(None, None, "cp")),
            out_specs=P(None, None, "cp"),
            check_vma=False,
        )
        out = sharded(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        assert_expected(out, ref, rtol=2e-4, atol=2e-5)


def test_causal_ring_attention_matches_full():
    """Decoder-training mode: global causal mask across the cp ring."""
    devs = jax.devices()[:8]
    mesh = Mesh(np.asarray(devs), ("cp",))
    rng = np.random.RandomState(1)
    q = rng.randn(2, 4, 64, 16).astype(np.float32)
    k = rng.randn(2, 4, 64, 16).astype(np.float32)
    v = rng.randn(2, 4, 64, 16).astype(np.float32)
    ref = _full_attention(q, k, v, causal=True)

    for fn in (context_parallel_attention, gather_kv_attention):
        sharded = shard_map(
            lambda q_, k_, v_: fn(q_, k_, v_, "cp", causal=True),
            mesh=mesh,
            in_specs=(P(None, None, "cp"), P(None, None, "cp"), P(None, None, "cp")),
            out_specs=P(None, None, "cp"),
            check_vma=False,
        )
        out = sharded(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        assert_expected(out, ref, rtol=2e-4, atol=2e-5)


def test_zigzag_split_roundtrip():
    x = np.arange(32).reshape(1, 1, 32, 1).astype(np.float32)
    z = np.asarray(zigzag_split(jnp.asarray(x), 8))
    # shard 0 of 8 holds chunks 0 and 15
    assert z[0, 0, :2, 0].tolist() == [0, 1]
    assert z[0, 0, 2:4, 0].tolist() == [30, 31]
    np.testing.assert_array_equal(
        np.asarray(zigzag_restore(jnp.asarray(z), 8)), x
    )


def test_zigzag_causal_ring_attention_matches_full():
    """Load-balanced causal ring (zigzag layout) == full causal attention."""
    devs = jax.devices()[:8]
    mesh = Mesh(np.asarray(devs), ("cp",))
    rng = np.random.RandomState(3)
    q = rng.randn(2, 4, 64, 16).astype(np.float32)
    k = rng.randn(2, 4, 64, 16).astype(np.float32)
    v = rng.randn(2, 4, 64, 16).astype(np.float32)
    ref = _full_attention(q, k, v, causal=True)

    sharded = shard_map(
        lambda q_, k_, v_: zigzag_context_parallel_attention(q_, k_, v_, "cp"),
        mesh=mesh,
        in_specs=(P(None, None, "cp"),) * 3,
        out_specs=P(None, None, "cp"),
            check_vma=False,
    )
    out = sharded(
        zigzag_split(jnp.asarray(q), 8),
        zigzag_split(jnp.asarray(k), 8),
        zigzag_split(jnp.asarray(v), 8),
    )
    out = zigzag_restore(out, 8)
    assert_expected(out, ref, rtol=2e-4, atol=2e-5)


def test_causal_ring_attention_cp_vs_single_device():
    """cp=8 causal ring output equals the same computation on one device."""
    devs = jax.devices()[:8]
    mesh = Mesh(np.asarray(devs), ("cp",))
    rng = np.random.RandomState(2)
    q = rng.randn(1, 2, 128, 32).astype(np.float32)
    k = rng.randn(1, 2, 128, 32).astype(np.float32)
    v = rng.randn(1, 2, 128, 32).astype(np.float32)
    ref = _full_attention(q, k, v, causal=True)

    sharded = shard_map(
        lambda q_, k_, v_: context_parallel_attention(q_, k_, v_, "cp", causal=True),
        mesh=mesh,
        in_specs=(P(None, None, "cp"), P(None, None, "cp"), P(None, None, "cp")),
        out_specs=P(None, None, "cp"),
            check_vma=False,
    )
    out = sharded(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    assert_expected(out, ref, rtol=2e-4, atol=2e-5)
