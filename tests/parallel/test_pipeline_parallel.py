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


# ---------------------------------------------------------------------------
# Heterogeneous (embed / K-blocks / head) pipeline — PP as a MODEL capability
# ---------------------------------------------------------------------------

import json

from multimodal_tpu.examples.long_context.model import (
    LongContextLM,
    next_token_loss,
)
from multimodal_tpu.examples.long_context.pipeline_model import (
    PipelinedLM,
    lm_params_to_pipeline,
    pipeline_params_to_lm,
)

L, D2, H2, FF2, VOC, SEQ = 8, 32, 4, 64, 64, 16


def _lm():
    return LongContextLM(vocab_size=VOC, max_seq_len=SEQ, n_layer=L,
                         d_model=D2, n_head=H2, dim_feedforward=FF2)


def _lm_setup():
    lm = _lm()
    tokens = jax.random.randint(jax.random.PRNGKey(1), (16, SEQ + 1), 0, VOC)
    variables = jax.jit(lm.init)(jax.random.PRNGKey(0), tokens[:, :-1])
    return lm, tokens, variables


def _plm(mesh, n_virtual, n_micro):
    return PipelinedLM(vocab_size=VOC, max_seq_len=SEQ, n_layer=L,
                       d_model=D2, n_head=H2, dim_feedforward=FF2,
                       mesh=mesh, n_virtual=n_virtual, n_micro=n_micro)


def test_lm_pipeline_param_roundtrip():
    _, _, variables = _lm_setup()
    pp = lm_params_to_pipeline(variables, n_stages=4, n_virtual=2)
    back = pipeline_params_to_lm(pp)
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lm_pipeline_forward_and_grads_match_sequential():
    """Full LM (embed + 8 blocks + head) through the heterogeneous pipeline:
    GPipe (V=1) and interleaved circular (V=2, V=4) schedules all produce
    the sequential model's exact loss and gradients."""
    lm, tokens, variables = _lm_setup()
    ref_loss = float(next_token_loss(lm.apply(variables, tokens[:, :-1]),
                                     tokens[:, 1:]))
    g_ref = jax.grad(
        lambda p, t: next_token_loss(lm.apply(p, t[:, :-1]), t[:, 1:])
    )(variables, tokens)

    for n_stages, n_virtual, n_micro in [(4, 1, 4), (2, 2, 4), (4, 2, 4),
                                         (2, 4, 4)]:
        mesh = create_mesh(dp=2, fsdp=1, tp=1, cp=1, pp=n_stages,
                           devices=jax.devices()[:2 * n_stages])
        plm = _plm(mesh, n_virtual, n_micro)
        pp_params = lm_params_to_pipeline(variables, n_stages, n_virtual)
        with jax.set_mesh(mesh):
            loss = float(jax.jit(plm.loss_fn)(pp_params, tokens))
            g_pp = jax.jit(jax.grad(plm.loss_fn))(pp_params, tokens)
        assert abs(loss - ref_loss) < 1e-5, (n_stages, n_virtual)
        g_pp_lm = pipeline_params_to_lm(g_pp)
        for a, b in zip(jax.tree_util.tree_leaves(g_pp_lm),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5,
                err_msg=f"S={n_stages} V={n_virtual}",
            )


def test_lm_pipeline_trainer_fit_trajectory_matches_sequential(tmp_path):
    """Trainer.fit over a dp=2 × pp=4 mesh trains the pipelined LM on the
    SAME loss trajectory as a hand-rolled sequential (unpipelined) training
    loop with the identical optimizer — pp is a drop-in training strategy,
    not just an op (VERDICT r3 item 1)."""
    from multimodal_tpu.examples.long_context.train import build_pp_trainer

    lm, tokens, variables = _lm_setup()
    mesh = create_mesh(dp=2, fsdp=1, tp=1, cp=1, pp=4)
    plm = _plm(mesh, n_virtual=2, n_micro=4)
    pp_params = lm_params_to_pipeline(variables, 4, n_virtual=2)

    batches = [
        {"tokens": np.asarray(
            jax.random.randint(jax.random.PRNGKey(10 + i), (16, SEQ + 1),
                               0, VOC))}
        for i in range(3)
    ]

    trainer = build_pp_trainer(plm, mesh, learning_rate=1e-3,
                               log_dir=str(tmp_path))
    trainer.logger.log_interval = 1
    state = trainer.init_state(pp_params)
    state = trainer.fit(state, iter(batches), num_steps=3)
    got = [
        json.loads(l)["loss"]
        for l in open(tmp_path / "metrics.jsonl")
    ]

    # sequential reference with the identical optax chain
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(1e-3, weight_decay=0.1))
    params, opt_state = variables, None
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s, t):
        def loss_fn(p):
            return next_token_loss(lm.apply(p, t[:, :-1]), t[:, 1:])
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    ref = []
    for b in batches:
        params, opt_state, l = step(params, opt_state,
                                    jnp.asarray(b["tokens"]))
        ref.append(float(l))

    np.testing.assert_allclose(got, ref, rtol=1e-4)
