"""Tensor parallelism: logical-axis rules produce real tp shardings and
tp=2 matches tp=1 numerically (new capability vs the reference, SURVEY §2.8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_tpu.models.clip.image_encoder import CLIPViTEncoder
from multimodal_tpu.models.clip.model import CLIP
from multimodal_tpu.models.clip.text_encoder import CLIPTextEncoder
from multimodal_tpu.parallel.mesh import batch_sharding, create_mesh
from multimodal_tpu.parallel.sharding import tp_sharding


def _small_clip():
    return CLIP(
        CLIPViTEncoder(embedding_dim=32, patch_size=8, image_size=32, width=64,
                       heads=4, layers=2),
        CLIPTextEncoder(embedding_dim=32, context_length=16, vocab_size=128,
                        width=64, dim_feedforward=128, heads=4, layers=2),
    )


def _spec_names(sharding):
    names = set()
    for entry in sharding.spec:
        if entry is None:
            continue
        for n in (entry if isinstance(entry, tuple) else (entry,)):
            names.add(n)
    return names


def test_tp_rules_emit_tp_specs():
    mesh = create_mesh(dp=1, fsdp=2, tp=4, cp=1)
    model = _small_clip()
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3)), jnp.ones((1, 16), jnp.int32),
    )
    shardings = tp_sharding(params, mesh, min_weight_size=0)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    tp_paths = [
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, s in flat if "tp" in _spec_names(s)
    ]
    # QKV (in_proj), out_proj, and both MLP matmuls must carry the tp axis
    assert any("in_proj/kernel" in p for p in tp_paths), tp_paths
    assert any("out_proj/kernel" in p for p in tp_paths), tp_paths
    assert any("linear1/kernel" in p for p in tp_paths), tp_paths
    assert any("linear2/kernel" in p for p in tp_paths), tp_paths
    # column-parallel shards OUT dim, row-parallel shards IN dim
    by_path = {
        "/".join(str(getattr(k, "key", k)) for k in path): s for path, s in flat
    }
    in_proj = next(v for k, v in by_path.items() if k.endswith("in_proj/kernel"))
    out_proj = next(v for k, v in by_path.items() if k.endswith("out_proj/kernel"))
    assert in_proj.spec[1] == "tp" and out_proj.spec[0] == "tp"


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_matches_single_device(tp):
    """Jitted forward with tp-sharded params == unsharded single-device run."""
    model = _small_clip()
    images = np.random.RandomState(0).randn(8, 32, 32, 3).astype(np.float32)
    text = np.random.RandomState(1).randint(1, 127, size=(8, 16)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(images[:1]),
                        jnp.asarray(text[:1]))

    ref = jax.jit(model.apply)(params, jnp.asarray(images), jnp.asarray(text))

    mesh = create_mesh(dp=1, fsdp=8 // tp, tp=tp, cp=1)
    shardings = tp_sharding(params, mesh, min_weight_size=0)
    sharded_params = jax.device_put(params, shardings)
    data = batch_sharding(mesh)
    img_s = jax.device_put(jnp.asarray(images), data)
    txt_s = jax.device_put(jnp.asarray(text), data)
    with mesh:
        out = jax.jit(model.apply)(sharded_params, img_s, txt_s)

    np.testing.assert_allclose(
        np.asarray(out.embeddings_a), np.asarray(ref.embeddings_a),
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.embeddings_b), np.asarray(ref.embeddings_b),
        rtol=2e-5, atol=2e-5,
    )


def test_tp_gradients_match():
    """Contrastive train-step gradients agree between tp=2 mesh and 1 device."""
    from multimodal_tpu.modules.losses.contrastive_loss_with_temperature import (
        contrastive_loss_with_temperature,
    )

    model = _small_clip()
    images = np.random.RandomState(2).randn(8, 32, 32, 3).astype(np.float32)
    text = np.random.RandomState(3).randint(1, 127, size=(8, 16)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(images[:1]),
                        jnp.asarray(text[:1]))
    scale = jnp.asarray(np.log(1 / 0.07), jnp.float32)

    def loss_fn(p, img, txt):
        out = model.apply(p, img, txt)
        return contrastive_loss_with_temperature(
            out.embeddings_a, out.embeddings_b, scale
        ).loss

    ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss_fn))(
        params, jnp.asarray(images), jnp.asarray(text)
    )

    mesh = create_mesh(dp=2, fsdp=2, tp=2, cp=1)
    shardings = tp_sharding(params, mesh, min_weight_size=0)
    p_s = jax.device_put(params, shardings)
    data = batch_sharding(mesh)
    with mesh:
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
            p_s, jax.device_put(jnp.asarray(images), data),
            jax.device_put(jnp.asarray(text), data),
        )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for ga, gb in zip(jax.tree_util.tree_leaves(ref_grads),
                      jax.tree_util.tree_leaves(grads)):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   rtol=5e-4, atol=5e-5)
