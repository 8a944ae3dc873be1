"""MUGEN video transform.

Parity with reference ``transforms/video_transform.py:21`` (VideoTransform):
temporal resample to a fixed frame count, spatial resize, normalize.
On-device (jit-able) — resampling/resize/normalize are pure jnp ops over
``(b, t, h, w, c)`` batches.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

MUGEN_DEFAULT_TIME_SAMPLES = 32
DEFAULT_MEAN = (0.43216, 0.394666, 0.37645)
DEFAULT_STD = (0.22803, 0.22145, 0.216989)


class VideoTransform:
    def __init__(
        self,
        time_samples: int = MUGEN_DEFAULT_TIME_SAMPLES,
        resize_shape: Tuple[int, int] = (224, 224),
        mean: Sequence[float] = DEFAULT_MEAN,
        std: Sequence[float] = DEFAULT_STD,
    ):
        self.time_samples = time_samples
        self.resize_shape = tuple(resize_shape)
        self.mean = jnp.asarray(mean, jnp.float32)
        self.std = jnp.asarray(std, jnp.float32)

    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        """video: (b, t, h, w, c) uint8/float -> normalized (b, T, H, W, c)."""
        if video.ndim != 5:
            raise ValueError(f"expected (b, t, h, w, c) video, got {video.shape}")
        v = video.astype(jnp.float32)
        if v.dtype != video.dtype or video.dtype == jnp.uint8:
            v = v / 255.0
        b, t, h, w, c = v.shape
        if t != self.time_samples:
            # linear temporal interpolation (reference uses F.interpolate)
            v = jax.image.resize(
                v, (b, self.time_samples, h, w, c), method="linear"
            )
        v = jax.image.resize(
            v, (b, self.time_samples) + self.resize_shape + (c,), method="bilinear"
        )
        return (v - self.mean) / self.std
