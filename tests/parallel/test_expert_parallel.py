"""Expert parallelism: ep=8 sharded MoE == single-device MoE, expert
params genuinely carry the ep axis, and a dp×ep train step matches the
unsharded trajectory (new capability vs the reference, SURVEY §2.8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_tpu.modules.layers.moe import moe_aux_loss
from multimodal_tpu.modules.layers.transformer import TransformerEncoder
from multimodal_tpu.parallel.mesh import create_mesh
from multimodal_tpu.parallel.sharding import batch_sharding, tp_sharding


def _moe_encoder(ep_axis_name=None):
    return TransformerEncoder(
        n_layer=2, d_model=32, n_head=4, dim_feedforward=64,
        activation="gelu", norm_first=True,
        moe_num_experts=8, moe_top_k=2, moe_capacity_factor=2.0,
        moe_interval=1, ep_axis_name=ep_axis_name,
    )


def _spec_names(sharding):
    names = set()
    for entry in sharding.spec:
        if entry is None:
            continue
        for n in (entry if isinstance(entry, tuple) else (entry,)):
            names.add(n)
    return names


def test_ep_rules_shard_expert_dim():
    mesh = create_mesh(dp=1, fsdp=1, tp=1, cp=1, ep=8)
    model = _moe_encoder("ep")
    x = jnp.zeros((2, 8, 32))
    params = model.init(jax.random.PRNGKey(0), x)
    shardings = tp_sharding(params, mesh, min_weight_size=0)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    by_path = {
        "/".join(str(getattr(k, "key", k)) for k in path): s for path, s in flat
    }
    wi = next(v for k, v in by_path.items() if k.endswith("feedforward/wi"))
    wo = next(v for k, v in by_path.items() if k.endswith("feedforward/wo"))
    router = next(v for k, v in by_path.items() if k.endswith("router/kernel"))
    assert wi.spec[0] == "ep" and wo.spec[0] == "ep"
    assert "ep" not in _spec_names(router)


def test_ep8_forward_matches_unsharded():
    mesh = create_mesh(dp=1, fsdp=1, tp=1, cp=1, ep=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 32))

    ref_model = _moe_encoder(None)
    params = ref_model.init(jax.random.PRNGKey(0), x)
    expected = ref_model.apply(params, x).last_hidden_state

    ep_model = _moe_encoder("ep")
    shardings = tp_sharding(params, mesh, min_weight_size=0)
    sharded_params = jax.tree_util.tree_map(jax.device_put, params, shardings)
    with jax.set_mesh(mesh):
        got = jax.jit(
            lambda p, x: ep_model.apply(p, x).last_hidden_state
        )(sharded_params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_ep_train_step_matches_unsharded_trajectory():
    mesh = create_mesh(dp=2, fsdp=1, tp=1, cp=1, ep=4)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 32))
    target = jax.random.normal(jax.random.PRNGKey(3), (4, 16, 32))

    def make_step(model):
        def loss_fn(params, x, target):
            out, inter = model.apply(
                params, x, mutable=["intermediates"]
            )
            mse = jnp.mean((out.last_hidden_state - target) ** 2)
            return mse + moe_aux_loss(inter["intermediates"])

        opt = optax.adam(1e-3)

        def step(params, opt_state, x, target):
            loss, grads = jax.value_and_grad(loss_fn)(params, x, target)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return opt, step

    # unsharded trajectory
    ref_model = _moe_encoder(None)
    params = ref_model.init(jax.random.PRNGKey(0), x)
    opt, step = make_step(ref_model)
    p_ref, s_ref = params, opt.init(params)
    ref_losses = []
    for _ in range(3):
        p_ref, s_ref, l = step(p_ref, s_ref, x, target)
        ref_losses.append(float(l))

    # dp×ep trajectory
    ep_model = _moe_encoder("ep")
    opt, step = make_step(ep_model)
    shardings = tp_sharding(params, mesh, min_weight_size=0)
    p_ep = jax.tree_util.tree_map(jax.device_put, params, shardings)
    s_ep = opt.init(p_ep)
    bs = batch_sharding(mesh)
    x_s = jax.device_put(x, bs)
    t_s = jax.device_put(target, bs)
    ep_losses = []
    with jax.set_mesh(mesh):
        jstep = jax.jit(step)
        for _ in range(3):
            p_ep, s_ep, l = jstep(p_ep, s_ep, x_s, t_s)
            ep_losses.append(float(l))

    np.testing.assert_allclose(ep_losses, ref_losses, rtol=1e-4)


def test_moe_lm_recipe_trainer_fit_dp_ep():
    """Trainer.fit drives the MoE LM recipe over a dp x ep mesh with the
    rule-based sharding strategy."""
    from multimodal_tpu.examples.long_context.model import LongContextLM
    from multimodal_tpu.examples.long_context.train import (
        TokenWindowDataset,
        build_trainer,
        synthetic_tokens,
        token_batches,
    )

    mesh = create_mesh(dp=2, fsdp=1, tp=1, cp=1, ep=4)
    model = LongContextLM(
        vocab_size=64, max_seq_len=32, n_layer=2, d_model=32, n_head=2,
        dim_feedforward=64, moe_num_experts=4, moe_interval=1,
        ep_axis_name="ep",
    )
    trainer = build_trainer(model, mesh, learning_rate=1e-2, strategy="tp")
    with jax.set_mesh(mesh):
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 32), jnp.int32)
        )
    state = trainer.init_state(params)
    # expert tensors genuinely carry ep through the Trainer's sharding
    wi = state["params"]["params"]["decoder"]["layer_0"]["feedforward"]["wi"]
    assert "ep" in str(wi.sharding.spec), wi.sharding
    data = token_batches(
        TokenWindowDataset(synthetic_tokens(64, 32 * 64), 32), batch_size=4
    )
    state = trainer.fit(state, data, num_steps=6)
    assert int(state["step"]) == 6


def test_moe_lm_cp_ep_composed():
    """cp (zigzag ring attention) and ep (expert all-to-all) compose in one
    model on a cp x ep mesh: forward matches the unsharded model."""
    from multimodal_tpu.examples.long_context.model import LongContextLM

    mesh = create_mesh(dp=1, fsdp=1, tp=1, cp=2, ep=4)
    cfg = dict(
        vocab_size=64, max_seq_len=16, n_layer=2, d_model=32, n_head=2,
        dim_feedforward=64, moe_num_experts=4, moe_interval=1,
        moe_capacity_factor=4.0,
    )
    tokens = jax.random.randint(jax.random.PRNGKey(0), (4, 16), 0, 64)

    ref_model = LongContextLM(**cfg)
    params = ref_model.init(jax.random.PRNGKey(1), tokens)
    expected = ref_model.apply(params, tokens)

    sharded_model = LongContextLM(**cfg, cp_axis_name="cp", ep_axis_name="ep")
    shardings = tp_sharding(params, mesh, min_weight_size=0)
    p_sharded = jax.tree_util.tree_map(jax.device_put, params, shardings)
    with jax.set_mesh(mesh):
        got = jax.jit(lambda p, t: sharded_model.apply(p, t))(p_sharded, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=3e-5)
