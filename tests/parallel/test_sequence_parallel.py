"""Model-level context parallelism (round-3 integration, VERDICT r2 item 1).

The rings were already numerically verified at op level; these tests prove
the *framework* capability: transformer layers route through the
flash-block zigzag/ring via ``cp_axis_name``, and a GPT trained with
``cp=8`` follows the same loss trajectory as the identical model on one
device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodal_tpu.examples.long_context.model import LongContextLM, next_token_loss
from multimodal_tpu.modules.layers.multi_head_attention import MultiHeadSelfAttention
from multimodal_tpu.ops.flash_attention import DEFAULT_MASK_VALUE
from multimodal_tpu.parallel.mesh import create_mesh
from multimodal_tpu.parallel.sequence_parallel import (
    sequence_parallel_self_attention,
)

from tests.test_utils import assert_expected


def _dense(q, k, v, causal):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * d ** -0.5
    if causal:
        sq = s.shape[-2]
        s = jnp.where(jnp.tril(jnp.ones((sq, sq), bool)), s, DEFAULT_MASK_VALUE)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)


@pytest.mark.parametrize("causal", [False, True])
def test_sequence_parallel_attention_matches_dense(causal):
    mesh = create_mesh(dp=2, fsdp=1, tp=1, cp=4)
    rng = np.random.RandomState(0)
    b, h, s, d = 4, 2, 64, 16
    q, k, v = (jnp.asarray(rng.randn(b, h, s, d).astype(np.float32)) for _ in range(3))
    with jax.set_mesh(mesh):
        out = jax.jit(
            lambda q, k, v: sequence_parallel_self_attention(
                q, k, v, "cp", causal=causal
            )
        )(q, k, v)
    assert_expected(out, _dense(q, k, v, causal), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_sequence_parallel_gradients_match_dense(causal):
    mesh = create_mesh(dp=1, fsdp=1, tp=1, cp=8)
    rng = np.random.RandomState(1)
    b, h, s, d = 2, 2, 64, 16
    q, k, v, gw = (
        jnp.asarray(rng.randn(b, h, s, d).astype(np.float32)) for _ in range(4)
    )
    with jax.set_mesh(mesh):
        g_cp = jax.jit(
            jax.grad(
                lambda q, k, v: jnp.sum(
                    sequence_parallel_self_attention(q, k, v, "cp", causal=causal) * gw
                ),
                argnums=(0, 1, 2),
            )
        )(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(_dense(q, k, v, causal) * gw), argnums=(0, 1, 2)
    )(q, k, v)
    for gc, gr in zip(g_cp, g_ref):
        assert_expected(gc, gr, atol=3e-5, rtol=3e-5)


def test_mhsa_layer_cp_equivalence():
    """Same params, cp_axis_name on/off -> identical layer output."""
    mesh = create_mesh(dp=1, fsdp=1, tp=1, cp=8)
    layer_ref = MultiHeadSelfAttention(embed_dim=32, num_heads=4)
    layer_cp = MultiHeadSelfAttention(embed_dim=32, num_heads=4, cp_axis_name="cp")
    x = jnp.asarray(np.random.RandomState(2).randn(2, 32, 32).astype(np.float32))
    params = layer_ref.init(jax.random.PRNGKey(0), x)
    ref = layer_ref.apply(params, x, is_causal=True)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, x: layer_cp.apply(p, x, is_causal=True))(params, x)
    assert_expected(out, ref, atol=2e-5, rtol=2e-5)


def test_long_context_lm_cp8_matches_cp1_training_trajectory():
    """The VERDICT r2 'done' criterion: a small GPT trained over a cp=8 mesh
    follows the cp=1 loss trajectory step for step (>= 3 steps)."""
    cfg = dict(vocab_size=97, max_seq_len=64, n_layer=2, d_model=32,
               n_head=2, dim_feedforward=64)
    model_ref = LongContextLM(**cfg)
    model_cp = LongContextLM(**cfg, cp_axis_name="cp")
    mesh = create_mesh(dp=1, fsdp=1, tp=1, cp=8)

    rng = np.random.RandomState(3)
    batches = [
        jnp.asarray(rng.randint(97, size=(4, 65)).astype(np.int32))
        for _ in range(4)
    ]
    params = model_ref.init(jax.random.PRNGKey(0), batches[0][:, :-1])
    tx = optax.adamw(1e-3)

    def make_step(model):
        def loss_fn(params, tokens):
            logits = model.apply(params, tokens[:, :-1])
            return next_token_loss(logits, tokens[:, 1:])

        @jax.jit
        def step(params, opt_state, tokens):
            loss, grads = jax.value_and_grad(loss_fn)(params, tokens)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    # reference: single-device trajectory
    step_ref = make_step(model_ref)
    p_ref, o_ref = params, tx.init(params)
    losses_ref = []
    for tok in batches:
        p_ref, o_ref, loss = step_ref(p_ref, o_ref, tok)
        losses_ref.append(float(loss))

    # cp=8 trajectory over the mesh
    step_cp = make_step(model_cp)
    with jax.set_mesh(mesh):
        p_cp, o_cp = params, tx.init(params)
        losses_cp = []
        for tok in batches:
            p_cp, o_cp, loss = step_cp(p_cp, o_cp, tok)
            losses_cp.append(float(loss))

    np.testing.assert_allclose(losses_cp, losses_ref, rtol=2e-4, atol=2e-4)
    # final params equivalent too
    for a, b in zip(jax.tree_util.tree_leaves(p_cp), jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_long_context_recipe_trainer_fit():
    """Trainer.fit drives the long-context recipe over a dp x cp mesh."""
    from multimodal_tpu.examples.long_context.train import (
        TokenWindowDataset,
        build_trainer,
        synthetic_tokens,
        token_batches,
    )

    mesh = create_mesh(dp=2, fsdp=1, tp=1, cp=4)
    model = LongContextLM(
        vocab_size=64, max_seq_len=32, n_layer=2, d_model=32, n_head=2,
        dim_feedforward=64, cp_axis_name="cp",
    )
    trainer = build_trainer(model, mesh, learning_rate=1e-3)
    with jax.set_mesh(mesh):
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 32), jnp.int32)
        )
    state = trainer.init_state(params)
    data = token_batches(
        TokenWindowDataset(synthetic_tokens(64, 32 * 64), 32), batch_size=4
    )
    state = trainer.fit(state, data, num_steps=3)
    assert int(state["step"]) == 3
