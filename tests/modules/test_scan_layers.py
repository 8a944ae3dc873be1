"""scan_layers: nn.scan-stacked encoder == Python-loop encoder.

The scan layout exists for compile-time scaling (one traced block per tower
regardless of depth — the 10B envelope test rides on it); these tests pin
its numerics to the loop layout: same per-layer weights => same outputs
and gradients up to fusion-level float reassociation (~1e-6), for both pre- and post-norm blocks, and through
the full FLAVA model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.modules.layers.transformer import (
    TransformerEncoder,
    stack_encoder_layer_params,
    unstack_encoder_layer_params,
)

N_LAYER, D, H, FF = 4, 32, 4, 64


def _encoders(norm_first, **kw):
    cfg = dict(
        n_layer=N_LAYER, d_model=D, n_head=H, dim_feedforward=FF,
        activation="gelu", norm_first=norm_first, **kw,
    )
    return (
        TransformerEncoder(**cfg),
        TransformerEncoder(scan_layers=True, **cfg),
    )


@pytest.mark.parametrize("norm_first", [True, False])
def test_scan_forward_matches_loop(norm_first):
    loop, scan = _encoders(norm_first)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 9, D), jnp.float32)
    mask = jnp.ones((2, 1, 1, 9), bool).at[:, :, :, -2:].set(False)
    params = loop.init(jax.random.PRNGKey(0), x)
    scan_params = {
        "params": stack_encoder_layer_params(params["params"], N_LAYER)
    }
    ref = loop.apply(params, x, attention_mask=mask).last_hidden_state
    got = scan.apply(scan_params, x, attention_mask=mask).last_hidden_state
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=2e-5, atol=2e-5)


def test_scan_grads_match_loop():
    loop, scan = _encoders(True)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 7, D), jnp.float32)
    params = loop.init(jax.random.PRNGKey(1), x)
    scan_params = {
        "params": stack_encoder_layer_params(params["params"], N_LAYER)
    }

    def loss_loop(p):
        return jnp.sum(loop.apply(p, x).last_hidden_state ** 2)

    def loss_scan(p):
        return jnp.sum(scan.apply(p, x).last_hidden_state ** 2)

    g_loop = jax.grad(loss_loop)(params)["params"]
    g_scan = jax.grad(loss_scan)(scan_params)["params"]
    g_loop_stacked = stack_encoder_layer_params(g_loop, N_LAYER)
    by_path = lambda kv: str(kv[0])
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(g_loop_stacked)[0], key=by_path),
        sorted(jax.tree_util.tree_flatten_with_path(g_scan)[0], key=by_path),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=str(ka),
        )


def test_stack_unstack_roundtrip():
    loop, _ = _encoders(True, final_layer_norm_eps=1e-5)
    x = jnp.zeros((1, 3, D))
    params = loop.init(jax.random.PRNGKey(2), x)["params"]
    back = unstack_encoder_layer_params(
        stack_encoder_layer_params(params, N_LAYER)
    )
    by_path = lambda kv: str(kv[0])
    flat_a = sorted(jax.tree_util.tree_flatten_with_path(params)[0], key=by_path)
    flat_b = sorted(jax.tree_util.tree_flatten_with_path(back)[0], key=by_path)
    assert [str(k) for k, _ in flat_a] == [str(k) for k, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_rejects_taps_and_moe():
    _, scan = _encoders(True)
    x = jnp.zeros((1, 3, D))
    params = scan.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="scan_layers"):
        scan.apply(params, x, return_hidden_states=True)
    moe = TransformerEncoder(
        n_layer=2, d_model=D, n_head=H, dim_feedforward=FF,
        scan_layers=True, moe_num_experts=4,
    )
    with pytest.raises(ValueError, match="scan_layers"):
        moe.init(jax.random.PRNGKey(0), x)


def test_flava_scan_matches_loop():
    """Full FLAVA forward (pretrain losses included) under scan_layers
    equals the loop model with transplanted weights."""
    from multimodal_tpu.models.flava.model import flava_model

    kw = dict(
        image_hidden_size=D, image_num_attention_heads=H,
        image_num_hidden_layers=2, image_intermediate_size=FF,
        image_size=32, patch_size=16,
        text_hidden_size=D, text_num_attention_heads=H,
        text_num_hidden_layers=2, text_intermediate_size=FF,
        vocab_size=50, max_position_embeddings=16,
        multimodal_hidden_size=D, multimodal_num_attention_heads=H,
        multimodal_num_hidden_layers=2, multimodal_intermediate_size=FF,
        text_and_image_proj_size=D,
    )
    loop_model = flava_model(**kw)
    scan_model = flava_model(scan_layers=True, **kw)

    rng = np.random.RandomState(3)
    image = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    text = jnp.asarray(rng.randint(1, 50, (2, 12)), jnp.int32)
    text_masked = jnp.asarray(rng.randint(1, 50, (2, 12)), jnp.int32)
    mask = jnp.asarray(rng.rand(2, 2, 2) > 0.5)

    params = loop_model.init(
        jax.random.PRNGKey(0), image=image, text=text, text_masked=text_masked,
        image_patches_mask=mask,
    )["params"]

    converted = jax.tree_util.tree_map(lambda x: x, params)  # copy dicts
    for tower in ("image_encoder", "text_encoder", "mm_encoder"):
        t = dict(converted[tower])
        t["encoder"] = stack_encoder_layer_params(dict(t["encoder"]), 2)
        converted[tower] = t

    ref = loop_model.apply(
        {"params": params}, image=image, text=text, text_masked=text_masked,
        image_patches_mask=mask,
    )
    got = scan_model.apply(
        {"params": converted}, image=image, text=text, text_masked=text_masked,
        image_patches_mask=mask,
    )
    tol = dict(rtol=5e-5, atol=5e-5)
    for name in ("projected_image_embeddings", "projected_text_embeddings"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)), **tol
        )
    np.testing.assert_allclose(
        np.asarray(ref.multimodal_masked.last_hidden_state),
        np.asarray(got.multimodal_masked.last_hidden_state), **tol
    )
    # the synthesized tap must equal the loop's last per-layer tap
    np.testing.assert_allclose(
        np.asarray(ref.image.hidden_states[-1]),
        np.asarray(got.image.hidden_states[-1]), **tol
    )
