"""MoE feedforward: routing/dispatch correctness vs a dense per-expert
reference, capacity dropping, aux losses, and encoder integration.

New capability vs the reference (SURVEY §2.8: expert parallel absent
upstream) — correctness is established against a naive dense computation
with the same params, not against reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.modules.layers.activation import get_activation
from multimodal_tpu.modules.layers.moe import MoEFeedForward, moe_aux_loss
from multimodal_tpu.modules.layers.transformer import TransformerEncoder


def _dense_reference(params, x, k):
    """Per-token dense evaluation: run every expert on every token, combine
    with renormalized top-k gates. Equals the capacity dispatch whenever no
    token is dropped."""
    p = params["params"]
    logits = x.astype(jnp.float32) @ p["router"]["kernel"]
    probs = jax.nn.softmax(logits, axis=-1)
    gate_vals, expert_idx = jax.lax.top_k(probs, k)
    gate_vals = gate_vals / (gate_vals.sum(-1, keepdims=True) + 1e-9)

    act = get_activation("gelu")
    wi, wo, bi, bo = p["wi"], p["wo"], p["bi"], p["bo"]
    # all experts on all tokens: (E, G, S, D)
    h = act(jnp.einsum("gsd,edf->egsf", x, wi) + bi[:, None, None, :])
    all_out = jnp.einsum("egsf,efd->egsd", h, wo) + bo[:, None, None, :]
    combine = jnp.zeros(x.shape[:2] + (wi.shape[0],), jnp.float32)
    for j in range(k):
        combine = combine + gate_vals[..., j, None] * jax.nn.one_hot(
            expert_idx[..., j], wi.shape[0]
        )
    return jnp.einsum("gse,egsd->gsd", combine, all_out)


@pytest.fixture
def moe_setup():
    model = MoEFeedForward(
        dim=16, hidden_dim=32, num_experts=4, num_experts_per_token=2,
        capacity_factor=8.0,  # ample: nothing drops
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 16))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params, x


def test_moe_matches_dense_reference(moe_setup):
    model, params, x = moe_setup
    y = model.apply(params, x)
    expected = _dense_reference(params, x, k=2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected), atol=1e-5)


def test_moe_top1_matches_dense_reference():
    model = MoEFeedForward(
        dim=8, hidden_dim=16, num_experts=4, num_experts_per_token=1,
        capacity_factor=8.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 10, 8))
    params = model.init(jax.random.PRNGKey(2), x)
    y = model.apply(params, x)
    expected = _dense_reference(params, x, k=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected), atol=1e-5)


def test_moe_capacity_drops_tokens(moe_setup):
    model, params, x = moe_setup
    tight = MoEFeedForward(
        dim=16, hidden_dim=32, num_experts=4, num_experts_per_token=2,
        capacity_factor=0.25, min_capacity=1,
    )
    y_tight, inter = tight.apply(params, x, mutable=["intermediates"])
    dropped = jax.tree_util.tree_leaves(
        {k: v for k, v in jax.tree_util.tree_flatten_with_path(inter)[0]
         if "dropped" in "/".join(str(getattr(p, "key", p)) for p in k)}
    )
    assert float(dropped[0]) > 0.0
    y_ample = model.apply(params, x)
    assert not np.allclose(np.asarray(y_tight), np.asarray(y_ample))


def test_moe_aux_losses_sown_and_collected(moe_setup):
    model, params, x = moe_setup
    _, inter = model.apply(params, x, mutable=["intermediates"])
    total = moe_aux_loss(inter["intermediates"])
    assert np.isfinite(float(total)) and float(total) > 0.0
    # balanced-load lower bound: the Switch aux loss is >= 1 by Cauchy-Schwarz
    assert float(moe_aux_loss(inter["intermediates"], aux_weight=1.0, z_weight=0.0)) >= 0.99


def test_moe_gradients_flow_to_experts_and_router(moe_setup):
    model, params, x = moe_setup

    def loss(p):
        y, inter = model.apply(p, x, mutable=["intermediates"])
        return jnp.sum(y ** 2) + moe_aux_loss(inter["intermediates"])

    grads = jax.grad(loss)(params)["params"]
    for name in ("wi", "wo", "router"):
        leaf = grads[name]["kernel"] if name == "router" else grads[name]
        assert float(jnp.abs(leaf).max()) > 0.0, name


def test_encoder_moe_interval_layers():
    enc = TransformerEncoder(
        n_layer=4, d_model=16, n_head=2, dim_feedforward=32,
        activation="gelu", norm_first=True,
        moe_num_experts=4, moe_interval=2,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
    params = enc.init(jax.random.PRNGKey(1), x)["params"]
    # layers 1 and 3 are MoE (expert tensors), 0 and 2 dense
    assert "wi" in params["layer_1"]["feedforward"]
    assert "wi" in params["layer_3"]["feedforward"]
    assert "hidden_0" in params["layer_0"]["feedforward"]
    assert "hidden_0" in params["layer_2"]["feedforward"]
    out = enc.apply({"params": params}, x)
    assert out.last_hidden_state.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out.last_hidden_state)))
