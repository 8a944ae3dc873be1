"""Pipeline parallelism: pp=4 GPipe schedule == sequential stage-by-stage
execution, forward AND backward (autodiff through ppermute), plus a train
step over a dp×pp mesh (new capability vs the reference, SURVEY §2.8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_tpu.modules.layers.transformer import TransformerEncoderLayer
from multimodal_tpu.parallel.mesh import create_mesh
from multimodal_tpu.parallel.pipeline import (
    merge_microbatches,
    pipeline_apply,
    split_microbatches,
    stack_stage_params,
)

N_STAGES = 4
D = 16


def _layer():
    return TransformerEncoderLayer(
        d_model=D, n_head=2, dim_feedforward=32, activation="gelu",
        norm_first=True,
    )


def _stacked_params(rng, x_mb):
    layer = _layer()
    return stack_stage_params(
        lambda r, x: layer.init(r, x), rng, N_STAGES, x_mb
    )


def _stage_fn(params, x):
    return _layer().apply(params, x)


def _sequential(stacked, x):
    for i in range(N_STAGES):
        params_i = jax.tree_util.tree_map(lambda l: l[i], stacked)
        x = _stage_fn(params_i, x)
    return x


def test_pipeline_forward_matches_sequential():
    mesh = create_mesh(dp=1, fsdp=1, tp=1, cp=1, pp=N_STAGES, devices=jax.devices()[:4])
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 6, D))
    x_micro = split_microbatches(x, 4)
    stacked = _stacked_params(jax.random.PRNGKey(1), x_micro[0])

    expected = _sequential(stacked, x)
    got = merge_microbatches(
        pipeline_apply(_stage_fn, stacked, x_micro, mesh, axis_name="pp")
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_pipeline_grads_match_sequential():
    mesh = create_mesh(dp=1, fsdp=1, tp=1, cp=1, pp=N_STAGES, devices=jax.devices()[:4])
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 6, D))
    x_micro = split_microbatches(x, 4)
    stacked = _stacked_params(jax.random.PRNGKey(3), x_micro[0])

    def loss_seq(p):
        return jnp.sum(_sequential(p, x) ** 2)

    def loss_pp(p):
        out = pipeline_apply(_stage_fn, p, x_micro, mesh, axis_name="pp")
        return jnp.sum(merge_microbatches(out) ** 2)

    g_seq = jax.grad(loss_seq)(stacked)
    g_pp = jax.jit(jax.grad(loss_pp))(stacked)
    flat_seq = jax.tree_util.tree_leaves(g_seq)
    flat_pp = jax.tree_util.tree_leaves(g_pp)
    for a, b in zip(flat_seq, flat_pp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)


def test_pipeline_train_step_dp_pp_matches_sequential():
    mesh = create_mesh(dp=2, fsdp=1, tp=1, cp=1, pp=N_STAGES)
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 6, D))
    target = jax.random.normal(jax.random.PRNGKey(5), (8, 6, D))
    x_micro = split_microbatches(x, 2)
    t_micro = split_microbatches(target, 2)
    stacked = _stacked_params(jax.random.PRNGKey(6), x_micro[0])
    opt = optax.adam(1e-3)

    def run(loss_fn, params, n=3):
        state = opt.init(params)
        losses = []
        step = jax.jit(
            lambda p, s: _step(loss_fn, p, s)
        )
        for _ in range(n):
            params, state, l = step(params, state)
            losses.append(float(l))
        return losses

    def _step(loss_fn, params, state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    def loss_seq(p):
        return jnp.mean((_sequential(p, x) - target) ** 2)

    def loss_pp(p):
        out = pipeline_apply(_stage_fn, p, x_micro, mesh, axis_name="pp")
        return jnp.mean((out - t_micro) ** 2)

    ref = run(loss_seq, stacked)
    got = run(loss_pp, stacked)
    np.testing.assert_allclose(got, ref, rtol=1e-4)
