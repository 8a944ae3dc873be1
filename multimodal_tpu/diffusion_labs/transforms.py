"""Diffusion data transforms.

Parity with reference ``diffusion_labs/transforms/``
(RandomDiffusionSteps:13, v-prediction target transform, super-res /
inpainting helpers). Pure functions taking explicit rng keys.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from multimodal_tpu.diffusion_labs.predictors.predictors import v_target
from multimodal_tpu.diffusion_labs.schedules.discrete_gaussian_schedule import (
    DiscreteGaussianSchedule,
)


class RandomDiffusionSteps:
    """Sample t, noise, and xt into the batch dict (reference :13)."""

    def __init__(
        self,
        schedule: DiscreteGaussianSchedule,
        batched: bool = True,
        data_field: str = "x",
        time_field: str = "t",
        noise_field: str = "noise",
        noised_data_field: str = "xt",
    ):
        self.schedule = schedule
        self.batched = batched
        self.x0 = data_field
        self.t = time_field
        self.noise = noise_field
        self.xt = noised_data_field

    def __call__(self, rng: jax.Array, batch: Dict[str, Any]) -> Dict[str, Any]:
        if self.x0 not in batch:
            raise KeyError(f"{type(self).__name__} expects key {self.x0}")
        x0 = batch[self.x0]
        rng_t, rng_n = jax.random.split(rng)
        if not self.batched:
            x0b = x0[None]
            t = self.schedule.sample_steps(rng_t, x0b)[0]
            noise = self.schedule.sample_noise(rng_n, x0b)[0]
            xt = self.schedule.q_sample(x0b, noise[None], t[None])[0]
        else:
            t = self.schedule.sample_steps(rng_t, x0)
            noise = self.schedule.sample_noise(rng_n, x0)
            xt = self.schedule.q_sample(x0, noise, t)
        return {**batch, self.t: t, self.noise: noise, self.xt: xt}


class ComputeVTarget:
    """Add the v-prediction target (reference transforms/v_transform.py)."""

    def __init__(
        self,
        schedule: DiscreteGaussianSchedule,
        data_field: str = "x",
        noise_field: str = "noise",
        time_field: str = "t",
        target_field: str = "v",
    ):
        self.schedule = schedule
        self.x0 = data_field
        self.noise = noise_field
        self.t = time_field
        self.v = target_field

    def __call__(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        v = v_target(self.schedule, batch[self.x0], batch[self.noise], batch[self.t])
        return {**batch, self.v: v}


class SuperResolutionTransform:
    """Downsample + re-upsample as low-res conditioning
    (reference transforms/super_resolution_transform.py semantics)."""

    def __init__(self, data_field: str = "x", low_res_field: str = "low_res", factor: int = 4):
        self.data_field = data_field
        self.low_res_field = low_res_field
        self.factor = factor

    def __call__(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        x = batch[self.data_field]  # (b, h, w, c)
        b, h, w, c = x.shape
        small = jax.image.resize(x, (b, h // self.factor, w // self.factor, c), "bilinear")
        low_res = jax.image.resize(small, x.shape, "bilinear")
        return {**batch, self.low_res_field: low_res}


class InpaintingTransform:
    """Random rectangular masks for inpainting conditioning
    (reference transforms/inpainting_transform.py semantics)."""

    def __init__(self, data_field: str = "x", mask_field: str = "mask",
                 masked_field: str = "masked", min_frac: float = 0.2, max_frac: float = 0.6):
        self.data_field = data_field
        self.mask_field = mask_field
        self.masked_field = masked_field
        self.min_frac = min_frac
        self.max_frac = max_frac

    def __call__(self, rng: jax.Array, batch: Dict[str, Any]) -> Dict[str, Any]:
        x = batch[self.data_field]
        b, h, w, c = x.shape
        r_frac, r_pos = jax.random.split(rng)
        fracs = jax.random.uniform(r_frac, (b, 2), minval=self.min_frac, maxval=self.max_frac)
        mh = (fracs[:, 0] * h).astype(jnp.int32)
        mw = (fracs[:, 1] * w).astype(jnp.int32)
        pos = jax.random.uniform(r_pos, (b, 2))
        top = (pos[:, 0] * (h - mh)).astype(jnp.int32)
        left = (pos[:, 1] * (w - mw)).astype(jnp.int32)
        rows = jnp.arange(h)[None, :, None]
        cols = jnp.arange(w)[None, None, :]
        inside = (
            (rows >= top[:, None, None]) & (rows < (top + mh)[:, None, None])
            & (cols >= left[:, None, None]) & (cols < (left + mw)[:, None, None])
        )
        mask = inside[..., None].astype(x.dtype)  # 1 = hole
        return {**batch, self.mask_field: mask, self.masked_field: x * (1 - mask)}


def cascaded_resize(image: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """Halve by BOX (2x2 mean) while min side >= 2*resolution, then bicubic.

    On-device analog of the reference's PIL cascade
    (``diffusion_labs/utils/common.py:24-40``); BOX downsampling by exactly 2
    equals average pooling, so the cascade is a static Python loop over
    reshape-means followed by one bicubic resize.
    """
    h, w = image.shape[-3], image.shape[-2]
    while min(h, w) >= 2 * resolution:
        lead = image.shape[:-3]
        # crop odd trailing row/col so the 2x2 box pool reshape is exact
        image = image[..., : h // 2 * 2, : w // 2 * 2, :]
        image = image.reshape(lead + (h // 2, 2, w // 2, 2, image.shape[-1])).mean(
            axis=(-4, -2)
        )
        h, w = h // 2, w // 2
    scale = resolution / min(h, w)
    new_h, new_w = round(h * scale), round(w * scale)
    return jax.image.resize(
        image, image.shape[:-3] + (new_h, new_w, image.shape[-1]), method="bicubic"
    )


class Dalle2ImageTransform:
    """Resize (cascaded) -> center crop -> scale into [image_min, image_max].

    On-device jitted analog of the reference
    (``diffusion_labs/models/dalle2/transforms.py:17``); expects float or
    uint8 NHWC images in [0, 255] or [0, 1] PIL-style arrays under
    ``image_field`` of the batch dict.
    """

    def __init__(self, image_size: int = 64, image_min: float = -1.0,
                 image_max: float = 1.0, image_field: str = "x"):
        self.image_size = image_size
        self.image_min = image_min
        self.image_max = image_max
        self.image_field = image_field

    def __call__(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        if self.image_field not in batch:
            raise KeyError(f"Dalle2ImageTransform expects key {self.image_field}")
        x = jnp.asarray(batch[self.image_field])
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        x = cascaded_resize(x, self.image_size)
        h, w = x.shape[-3], x.shape[-2]
        top = (h - self.image_size) // 2
        left = (w - self.image_size) // 2
        x = x[..., top:top + self.image_size, left:left + self.image_size, :]
        x = x * (self.image_max - self.image_min) + self.image_min
        if squeeze:
            x = x[0]
        return {**batch, self.image_field: x}
