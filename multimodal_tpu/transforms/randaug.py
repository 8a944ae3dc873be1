"""RandAugment, TPU-native.

Re-expression of the reference's MAE RandAug
(``torchmultimodal/transforms/mae_transform.py:238-430``, itself the timm
variant of https://arxiv.org/abs/1909.13719): same 15 ops with the same
magnitude->parameter mappings, but every op is a pure ``jax.numpy`` function
on a float image in [0, 255] and the whole policy (op choice, apply
probability, gaussian magnitude jitter, random negation) runs inside ``jit``
under ``lax.switch`` with stateless PRNG keys — so augmentation is batchable
with ``vmap`` and runs on device instead of per-image host PIL.

Differences from the PIL implementation (noted, deliberate):
  - geometric ops always use bilinear resampling (the reference randomly
    picks bilinear/bicubic per call);
  - Equalize/Posterize/Solarize round the float image to integer bins
    internally instead of requiring uint8 storage.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_MAX_MAG = 10.0
_FILL = jnp.array([124.0, 116.0, 104.0])  # reference FILL_COLOR


# ------------------------------------------------------------- color ops

def _blend(a: jnp.ndarray, b: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    """PIL ImageEnhance semantics: factor 0 -> a (degenerate), 1 -> b."""
    return jnp.clip(a + (b - a) * factor, 0.0, 255.0)


def _grayscale(img: jnp.ndarray) -> jnp.ndarray:
    # PIL L-mode weights
    return img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114


def autocontrast(img: jnp.ndarray) -> jnp.ndarray:
    lo = img.min(axis=(0, 1))
    hi = img.max(axis=(0, 1))
    scale = 255.0 / jnp.maximum(hi - lo, 1e-6)
    out = (img - lo) * scale
    return jnp.where(hi > lo, jnp.clip(out, 0, 255), img)


def equalize(img: jnp.ndarray) -> jnp.ndarray:
    """Per-channel histogram equalization with PIL's LUT construction."""

    def chan(c: jnp.ndarray) -> jnp.ndarray:
        idx = jnp.clip(jnp.round(c), 0, 255).astype(jnp.int32)
        hist = jnp.zeros(256, jnp.float32).at[idx.reshape(-1)].add(1.0)
        nonzero = hist > 0
        # count of the last nonzero bin (PIL: histo[-1])
        last_idx = 255 - jnp.argmax(nonzero[::-1])
        step = jnp.floor((hist.sum() - hist[last_idx]) / 255.0)
        cum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(hist)])[:-1]
        lut = jnp.floor((jnp.floor(step / 2.0) + cum) / jnp.maximum(step, 1.0))
        lut = jnp.clip(lut, 0, 255)
        out = lut[idx]
        return jnp.where(step > 0, out, c)

    return jnp.stack([chan(img[..., i]) for i in range(3)], axis=-1)


def invert(img: jnp.ndarray) -> jnp.ndarray:
    return 255.0 - img


def posterize(img: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """Keep the top ``bits`` bits of each (rounded) channel value."""
    shift = (8 - bits).astype(jnp.int32)
    vals = jnp.clip(jnp.round(img), 0, 255).astype(jnp.int32)
    return ((vals >> shift) << shift).astype(img.dtype)


def solarize(img: jnp.ndarray, threshold: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(img >= threshold, 255.0 - img, img)


def solarize_add(img: jnp.ndarray, add: jnp.ndarray, thresh: float = 128.0) -> jnp.ndarray:
    return jnp.where(img < thresh, jnp.minimum(img + add, 255.0), img)


def adjust_saturation(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    return _blend(_grayscale(img)[..., None], img, factor)


def adjust_contrast(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    # PIL contrast degenerate = uniform image at the rounded mean gray level
    mean = jnp.round(_grayscale(img).mean())
    return _blend(mean, img, factor)


def adjust_brightness(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    return _blend(jnp.zeros_like(img), img, factor)


def adjust_sharpness(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    # PIL SMOOTH kernel; border pixels keep their original values
    kernel = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    smoothed = jax.vmap(
        lambda c: jax.scipy.signal.convolve2d(c, kernel, mode="same"),
        in_axes=-1, out_axes=-1,
    )(img)
    h, w = img.shape[:2]
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = ((ys > 0) & (ys < h - 1) & (xs > 0) & (xs < w - 1))[..., None]
    degenerate = jnp.where(interior, smoothed, img)
    return _blend(degenerate, img, factor)


# --------------------------------------------------------- geometric ops

def affine_sample(img: jnp.ndarray, matrix: jnp.ndarray,
                  fill: jnp.ndarray = _FILL) -> jnp.ndarray:
    """Bilinear inverse-warp: in_xy = matrix @ [x_out, y_out, 1] (PIL AFFINE)."""
    h, w = img.shape[:2]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=img.dtype),
                          jnp.arange(w, dtype=img.dtype), indexing="ij")
    # PIL convention: transform acts on pixel CENTERS (out + 0.5), and the
    # bilinear sampler places input pixel i's center at coordinate i + 0.5
    xc, yc = xs + 0.5, ys + 0.5
    xin = matrix[0, 0] * xc + matrix[0, 1] * yc + matrix[0, 2] - 0.5
    yin = matrix[1, 0] * xc + matrix[1, 1] * yc + matrix[1, 2] - 0.5
    x0 = jnp.floor(xin)
    y0 = jnp.floor(yin)
    wx = (xin - x0)[..., None]
    wy = (yin - y0)[..., None]

    def tap(yi, xi):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        px = img[jnp.clip(yi, 0, h - 1).astype(jnp.int32),
                 jnp.clip(xi, 0, w - 1).astype(jnp.int32)]
        return jnp.where(valid[..., None], px, fill.astype(img.dtype))

    top = tap(y0, x0) * (1 - wx) + tap(y0, x0 + 1) * wx
    bot = tap(y0 + 1, x0) * (1 - wx) + tap(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


def rotate(img: jnp.ndarray, degrees: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape[:2]
    cx, cy = w / 2.0, h / 2.0
    rad = degrees * jnp.pi / 180.0  # PIL rotates counterclockwise
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    matrix = jnp.array([
        [cos, -sin, cx - cx * cos + cy * sin],
        [sin, cos, cy - cx * sin - cy * cos],
    ])
    return affine_sample(img, matrix)


def shear_x(img: jnp.ndarray, shear: jnp.ndarray) -> jnp.ndarray:
    return affine_sample(img, jnp.array([[1.0, shear, 0.0], [0.0, 1.0, 0.0]]))


def shear_y(img: jnp.ndarray, shear: jnp.ndarray) -> jnp.ndarray:
    return affine_sample(img, jnp.array([[1.0, 0.0, 0.0], [shear, 1.0, 0.0]]))


def translate_x(img: jnp.ndarray, pixels: jnp.ndarray) -> jnp.ndarray:
    return affine_sample(img, jnp.array([[1.0, 0.0, pixels], [0.0, 1.0, 0.0]]))


def translate_y(img: jnp.ndarray, pixels: jnp.ndarray) -> jnp.ndarray:
    return affine_sample(img, jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, pixels]]))


# --------------------------------------------------------------- policy

OP_NAMES: Tuple[str, ...] = (
    "AutoContrast", "Equalize", "Invert", "Rotate", "PosterizeIncreasing",
    "SolarizeIncreasing", "SolarizeAdd", "ColorIncreasing",
    "ContrastIncreasing", "BrightnessIncreasing", "SharpnessIncreasing",
    "ShearX", "ShearY", "TranslateXRel", "TranslateYRel",
)


def _branches(h: int, w: int):
    """Op table: each branch maps (img, mag01 in [0,1], sign in {-1,1})."""
    return [
        lambda img, m, s: autocontrast(img),
        lambda img, m, s: equalize(img),
        lambda img, m, s: invert(img),
        lambda img, m, s: rotate(img, s * m * 30.0),
        lambda img, m, s: posterize(img, 4 - jnp.floor(m * 4).astype(jnp.int32)),
        lambda img, m, s: solarize(img, 256.0 - jnp.floor(m * 256.0)),
        lambda img, m, s: solarize_add(img, jnp.floor(m * 110.0)),
        lambda img, m, s: adjust_saturation(img, 1.0 + s * m * 0.9),
        lambda img, m, s: adjust_contrast(img, 1.0 + s * m * 0.9),
        lambda img, m, s: adjust_brightness(img, 1.0 + s * m * 0.9),
        lambda img, m, s: adjust_sharpness(img, 1.0 + s * m * 0.9),
        lambda img, m, s: shear_x(img, s * m * 0.3),
        lambda img, m, s: shear_y(img, s * m * 0.3),
        lambda img, m, s: translate_x(img, s * m * 0.45 * w),
        lambda img, m, s: translate_y(img, s * m * 0.45 * h),
    ]


class RandAugment:
    """Batched on-device RandAugment.

    ``__call__(key, images)`` takes uint8/float images ``(b, h, w, 3)`` (or a
    single ``(h, w, 3)`` image) and returns float32 images in [0, 255]. Each
    image in the batch draws its own ops/magnitudes from the split key.
    """

    def __init__(
        self,
        num_ops: int = 2,
        magnitude: float = 9.0,
        prob: float = 0.5,
        magnitude_std: float = 0.5,
    ):
        self.num_ops = num_ops
        self.magnitude = magnitude
        self.prob = prob
        self.magnitude_std = magnitude_std

    def _augment_one(self, key: jax.Array, img: jnp.ndarray) -> jnp.ndarray:
        h, w = img.shape[:2]
        branches = _branches(h, w)
        img = img.astype(jnp.float32)
        for op_key in jax.random.split(key, self.num_ops):
            k_op, k_apply, k_mag, k_sign = jax.random.split(op_key, 4)
            op_idx = jax.random.randint(k_op, (), 0, len(branches))
            mag = self.magnitude + self.magnitude_std * jax.random.normal(k_mag)
            mag01 = jnp.clip(mag, 0.0, _MAX_MAG) / _MAX_MAG
            sign = jnp.where(jax.random.bernoulli(k_sign), 1.0, -1.0)
            out = jax.lax.switch(op_idx, branches, img, mag01, sign)
            apply = jax.random.bernoulli(k_apply, self.prob)
            img = jnp.where(apply, out, img)
        return img

    @partial(jax.jit, static_argnums=0)
    def __call__(self, key: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
        if images.ndim == 3:
            return self._augment_one(key, images)
        keys = jax.random.split(key, images.shape[0])
        return jax.vmap(self._augment_one)(keys, images)
