"""MAE-style random masking, jit-safe (static keep lengths, argsort-of-noise).

Parity with reference ``modules/masking/random_masking.py`` (random_masking:21,
random_masking_2d:62). RNG is an explicit ``jax.random`` key — no hidden
global state — and gathers use ``jnp.take_along_axis`` which lowers to a
single XLA gather on TPU.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class RandomMaskingOutput(NamedTuple):
    x_masked: jnp.ndarray
    mask: jnp.ndarray
    ids_restore: jnp.ndarray
    ids_keep: jnp.ndarray


def random_masking(rng: jax.Array, x: jnp.ndarray, mask_ratio: float) -> RandomMaskingOutput:
    """Per-sample random masking by argsort of uniform noise.

    Returns kept tokens ``(n, len_keep, d)``, binary mask (1 = removed) in
    original order, restore ids, and keep ids.
    """
    n, l, d = x.shape
    len_keep = int(l * (1 - mask_ratio))
    assert len_keep >= 1, "must keep at least 1 patch"

    noise = jax.random.uniform(rng, (n, l))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)

    mask = jnp.ones((n, l), dtype=x.dtype).at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return RandomMaskingOutput(x_masked, mask, ids_restore, ids_keep)


def _random_masking_1d(
    rng: jax.Array, x: jnp.ndarray, mask_ratio: float, num_patches: int
) -> Tuple[jnp.ndarray, int]:
    n = x.shape[0]
    len_keep = int(num_patches * (1 - mask_ratio))
    noise = jax.random.uniform(rng, (n, num_patches))
    ids_keep = jnp.argsort(noise, axis=1)[:, :len_keep]
    x_masked = jnp.take_along_axis(x, ids_keep[:, :, None, None], axis=1)
    return x_masked, len_keep


def random_masking_2d(
    rng: jax.Array,
    x: jnp.ndarray,
    mask_ratio_h: float,
    mask_ratio_w: float,
    num_patches_h: int,
    num_patches_w: int,
) -> jnp.ndarray:
    """AudioMAE 2-d masking: mask rows then columns of the patch grid."""
    n, _, d = x.shape
    rng_h, rng_w = jax.random.split(rng)
    x = x.reshape(n, num_patches_h, num_patches_w, d)
    x, len_keep_h = _random_masking_1d(rng_h, x, mask_ratio_h, num_patches_h)
    x = jnp.swapaxes(x, 1, 2)
    x, len_keep_w = _random_masking_1d(rng_w, x, mask_ratio_w, num_patches_w)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(n, len_keep_h * len_keep_w, d)
