"""RandAugment op-level parity vs PIL and policy-level behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

from multimodal_tpu.transforms.randaug import (
    RandAugment,
    adjust_brightness,
    adjust_contrast,
    adjust_saturation,
    adjust_sharpness,
    autocontrast,
    equalize,
    invert,
    posterize,
    rotate,
    solarize,
    solarize_add,
    translate_x,
)

from tests.test_utils import assert_expected


@pytest.fixture(scope="module")
def img_np():
    r = np.random.RandomState(0)
    return r.randint(0, 256, (24, 32, 3), np.uint8)


def _pil(img_np):
    return Image.fromarray(img_np)


def test_invert_solarize_posterize_match_pil(img_np):
    x = jnp.asarray(img_np, jnp.float32)
    assert_expected(np.asarray(invert(x)), np.asarray(ImageOps.invert(_pil(img_np)), np.float32))
    assert_expected(np.asarray(solarize(x, 128.0)),
                    np.asarray(ImageOps.solarize(_pil(img_np), 128), np.float32))
    assert_expected(np.asarray(posterize(x, jnp.asarray(3))),
                    np.asarray(ImageOps.posterize(_pil(img_np), 3), np.float32))


def test_solarize_add_matches_reference_lut(img_np):
    x = jnp.asarray(img_np, jnp.float32)
    got = np.asarray(solarize_add(x, 100.0))
    lut = np.array([min(255, i + 100) if i < 128 else i for i in range(256)], np.float32)
    assert_expected(got, lut[img_np])


def test_autocontrast_and_equalize_match_pil(img_np):
    x = jnp.asarray(img_np, jnp.float32)
    got_ac = np.asarray(autocontrast(x))
    want_ac = np.asarray(ImageOps.autocontrast(_pil(img_np)), np.float32)
    # PIL rounds to uint8; allow 1-level difference
    assert np.abs(got_ac - want_ac).max() <= 1.0

    got_eq = np.asarray(equalize(x))
    want_eq = np.asarray(ImageOps.equalize(_pil(img_np)), np.float32)
    assert_expected(got_eq, want_eq)


def test_enhance_ops_match_pil(img_np):
    x = jnp.asarray(img_np, jnp.float32)
    pil = _pil(img_np)
    for factor in (0.4, 1.0, 1.7):
        pairs = [
            (adjust_brightness, ImageEnhance.Brightness),
            (adjust_contrast, ImageEnhance.Contrast),
            (adjust_saturation, ImageEnhance.Color),
            (adjust_sharpness, ImageEnhance.Sharpness),
        ]
        for ours, theirs in pairs:
            got = np.asarray(ours(x, jnp.asarray(factor)))
            want = np.asarray(theirs(pil).enhance(factor), np.float32)
            assert np.abs(got - want).max() <= 1.5, (ours.__name__, factor)


def test_rotate_close_to_pil(img_np):
    got = np.asarray(rotate(jnp.asarray(img_np, jnp.float32), jnp.asarray(20.0)))
    want = np.asarray(
        _pil(img_np).rotate(20.0, resample=Image.BILINEAR, fillcolor=(124, 116, 104)),
        np.float32,
    )
    # identical bilinear warp up to sub-pixel center/rounding conventions:
    # interior pixels should agree closely on average
    assert np.abs(got - want).mean() < 3.0
    assert np.median(np.abs(got - want)) <= 1.0


def test_translate_fill(img_np):
    x = jnp.asarray(img_np, jnp.float32)
    got = np.asarray(translate_x(x, jnp.asarray(10.0)))
    # PIL AFFINE matrix maps output->input: in_x = x + 10, so content shifts LEFT
    assert_expected(got[:, :-10], np.asarray(img_np, np.float32)[:, 10:])
    assert_expected(got[:, -10:], np.broadcast_to(
        np.array([124.0, 116.0, 104.0], np.float32), got[:, -10:].shape))


def test_randaugment_policy_batched(img_np):
    aug = RandAugment(num_ops=2, magnitude=9, prob=0.5)
    batch = jnp.stack([jnp.asarray(img_np)] * 4)
    key = jax.random.PRNGKey(0)
    out = aug(key, batch)
    assert out.shape == batch.shape and out.dtype == jnp.float32
    assert float(out.min()) >= 0.0 and float(out.max()) <= 255.0
    # deterministic under the same key
    out2 = aug(key, batch)
    assert_expected(np.asarray(out), np.asarray(out2))
    # different per-batch-element randomness
    per_img_equal = [
        bool(jnp.all(out[i] == out[j])) for i in range(4) for j in range(i + 1, 4)
    ]
    assert not all(per_img_equal)
    # single image path
    single = aug(jax.random.PRNGKey(1), jnp.asarray(img_np))
    assert single.shape == img_np.shape
