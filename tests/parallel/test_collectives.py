"""Distributed semantics on the 8-device virtual CPU mesh.

Analog of reference ``tests/utils/test_distributed.py`` (gather backprop
semantics) and the 1-GPU-vs-2-GPU contrastive equivalence test
(``tests/modules/losses/test_contrastive_loss_with_temperature.py:140-230``)
— but run with shard_map on virtual devices, no process spawning.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from multimodal_tpu.modules.losses.contrastive_loss_with_temperature import (
    contrastive_loss_with_temperature,
)
from multimodal_tpu.parallel.collectives import (
    BackpropType,
    all_gather_with_backprop_type,
)

from tests.test_utils import assert_expected


def _mesh():
    devs = jax.devices()
    assert len(devs) >= 8, f"need 8 virtual devices, got {len(devs)}"
    return Mesh(np.asarray(devs[:8]), ("dp",))


def test_gather_backprop_semantics():
    mesh = _mesh()
    x = jnp.arange(16, dtype=jnp.float32).reshape(8, 2)

    def grad_for(backprop_type):
        def per_device(xs):
            g = all_gather_with_backprop_type(xs, "dp", backprop_type)
            return jnp.sum(g ** 2)[None]  # per-device scalar, stacked over dp

        f = shard_map(
            per_device, mesh=mesh, in_specs=P("dp"), out_specs=P("dp")
        )
        return jax.grad(lambda x_: jnp.sum(f(x_)))(x)

    # GLOBAL: every shard's contribution flows back from all devices:
    # d/dx sum_over_devices sum(gathered^2) = 8 * 2x
    g_global = grad_for(BackpropType.GLOBAL)
    assert_expected(g_global, 16.0 * np.asarray(x))

    # LOCAL: only the local splice carries gradient: d/dx = 2x per device
    g_local = grad_for(BackpropType.LOCAL)
    assert_expected(g_local, 2.0 * np.asarray(x))

    # NONE: fully detached
    g_none = grad_for(BackpropType.NONE)
    assert_expected(g_none, np.zeros_like(np.asarray(x)))


@pytest.mark.parametrize("backprop_type", [BackpropType.GLOBAL, BackpropType.LOCAL])
def test_distributed_contrastive_matches_single_device(backprop_type):
    """8-way sharded loss == single-device global-batch loss (value); GLOBAL
    gradients also match."""
    mesh = _mesh()
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(16, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(16, 8).astype(np.float32))
    scale = jnp.asarray(1.0)

    single = contrastive_loss_with_temperature(a, b, scale)

    def per_device(a_s, b_s):
        return contrastive_loss_with_temperature(
            a_s, b_s, scale, backprop_type=backprop_type, axis_name="dp"
        ).loss[None]

    sharded_loss_fn = shard_map(
        per_device, mesh=mesh, in_specs=(P("dp"), P("dp")), out_specs=P("dp")
    )
    losses = sharded_loss_fn(a, b)  # per-device losses over the same global batch
    assert_expected(jnp.mean(losses), single.loss, atol=1e-5)

    if backprop_type == BackpropType.GLOBAL:
        g_single = jax.grad(
            lambda a_: contrastive_loss_with_temperature(a_, b, scale).loss
        )(a)
        g_shard = jax.grad(lambda a_: jnp.mean(sharded_loss_fn(a_, b)))(a)
        assert_expected(g_shard, g_single, atol=1e-5)


def test_contrastive_loss_golden():
    """Deterministic behavior checks mirroring the reference test intent."""
    rng = np.random.RandomState(1234)
    a = jnp.asarray(rng.randn(3, 5).astype(np.float32))
    b = jnp.asarray(rng.randn(3, 5).astype(np.float32))
    out = contrastive_loss_with_temperature(a, b, jnp.log(jnp.asarray(1 / 0.07)))
    assert out.loss.shape == ()
    assert out.logits_a.shape == (3, 3)
    # symmetric losses average to total
    assert_expected(out.loss, (out.loss_a + out.loss_b) / 2)
    # perfect alignment means near-zero loss at high temperature
    eye = jnp.eye(4, 8)
    out2 = contrastive_loss_with_temperature(eye, eye, jnp.log(jnp.asarray(100.0)))
    assert float(out2.loss) < 1e-3
