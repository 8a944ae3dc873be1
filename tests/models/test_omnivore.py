"""Omnivore / Swin3D tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.models.omnivore import Omnivore, PatchEmbedOmnivore, _omnivore
from multimodal_tpu.modules.encoders.swin_transformer_3d_encoder import (
    PatchEmbed3d,
    SwinTransformer3d,
)

from tests.test_utils import rng


def tiny_trunk(patch_embed=None):
    return SwinTransformer3d(
        patch_size=(2, 4, 4), embed_dim=16, depths=(1, 1), num_heads=(2, 4),
        window_size=(2, 2, 2), patch_embed=patch_embed,
    )


def test_swin3d_shapes():
    trunk = tiny_trunk()
    x = jnp.ones((1, 4, 16, 16, 3))
    params = trunk.init(rng(0), x)
    y = trunk.apply(params, x)
    assert y.shape == (1, 32)  # embed 16 * 2^(stages-1)


def test_swin3d_shifted_windows_nondivisible():
    """Input dims not divisible by window size exercise padding + shift."""
    trunk = SwinTransformer3d(
        patch_size=(1, 2, 2), embed_dim=8, depths=(2,), num_heads=(2,),
        window_size=(2, 3, 3),
    )
    x = jnp.ones((1, 3, 10, 10, 3))
    params = trunk.init(rng(0), x)
    y = trunk.apply(params, x)
    assert y.shape == (1, 8)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_omnivore_head_dispatch():
    model = _omnivore(16, (1, 1), (2, 4))
    video = jnp.ones((2, 4, 16, 16, 3))
    rgbd = jnp.ones((2, 1, 16, 16, 4))
    params = model.init(rng(0), rgbd, "rgbd")
    # rgbd input goes through the depth patch embedding
    out_rgbd = model.apply(params, rgbd, "rgbd")
    assert out_rgbd.shape == (2, 19)
    out_video = model.apply(params, video, "video")
    assert out_video.shape == (2, 400)
    out_image = model.apply(params, jnp.ones((2, 1, 16, 16, 3)), "image")
    assert out_image.shape == (2, 1000)
    with pytest.raises(ValueError):
        model.apply(params, video, "audio")


def test_patch_embed_omnivore_depth_path():
    pe = PatchEmbedOmnivore(patch_size=(1, 2, 2), embed_dim=8)
    rgb = jnp.ones((1, 2, 8, 8, 3))
    rgbd = jnp.ones((1, 2, 8, 8, 4))
    params = pe.init(rng(0), rgbd)
    out_rgb = pe.apply(params, rgb)
    out_rgbd = pe.apply(params, rgbd)
    assert out_rgb.shape == out_rgbd.shape == (1, 2, 4, 4, 8)
    # depth contributes
    assert float(jnp.abs(out_rgbd - out_rgb).sum()) > 0


@pytest.mark.slow
def test_omnivore_swin_param_counts():
    """Full-scale sanity: Swin3D-T/S trunk sizes must land at the published
    torchvision swin3d_t/s parameter counts (~28.2M / ~49.8M) plus the three
    task heads (reference omnivore.py:203-260 builder configs)."""
    import jax

    from multimodal_tpu.models.omnivore import omnivore_swin_s, omnivore_swin_t

    def count(model):
        shapes = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 2, 224, 224, 3)), "image"
            )
        )
        return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(shapes))

    n_t = count(omnivore_swin_t())
    n_s = count(omnivore_swin_s())
    # trunk ~28.2M/49.8M + heads (1000+400+19 classes on 768/1024-d features)
    assert 28e6 < n_t < 32e6, f"swin_t {n_t / 1e6:.1f}M"
    assert 49e6 < n_s < 54e6, f"swin_s {n_s / 1e6:.1f}M"
    assert n_s > n_t
