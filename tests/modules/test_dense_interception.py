"""dense_interception contract: layers whose fast paths bypass nn.Dense
(DenseParams + fused Pallas kernels) must, inside the scope, route every
matmul through module-boundary nn.Dense calls — with identical numerics and
an identical parameter tree — so nn.intercept_methods hooks (multi-LoRA
serving, serving/multi_lora.py) see all adapted kernels."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_tpu.modules.layers.dense_params import dense_interception
from multimodal_tpu.modules.layers.mlp import MLP


def _dense_paths_seen(module, params, x):
    seen = []

    def interceptor(next_fun, args, kwargs, context):
        if isinstance(context.module, nn.Dense) and context.method_name == "__call__":
            seen.append("/".join(context.module.path))
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor), dense_interception():
        out = module.apply(params, x)
    return seen, out


def test_mlp_dense_calls_visible_and_identical_under_interception():
    mlp = MLP(64, 64, 128, dropout=0.0, activation="gelu")
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 64), jnp.float32)
    params = mlp.init(jax.random.PRNGKey(0), x)
    fast = mlp.apply(params, x)
    seen, scoped = _dense_paths_seen(mlp, params, x)
    assert "hidden_0" in seen and "out" in seen
    np.testing.assert_allclose(np.asarray(fast), np.asarray(scoped), atol=1e-6)


def test_clip_layer_dense_calls_visible_and_identical_under_interception():
    from multimodal_tpu.models.clip.transformer import CLIPEncoderLayer

    layer = CLIPEncoderLayer(width=64, heads=4, dim_feedforward=128)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 7, 64), jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x)
    fast = layer.apply(params, x)
    seen, scoped = _dense_paths_seen(layer, params, x)
    for name in ("in_proj", "out_proj", "linear1", "linear2"):
        assert name in seen, f"{name} not visible to interceptors: {seen}"
    np.testing.assert_allclose(np.asarray(fast), np.asarray(scoped), atol=1e-5)
